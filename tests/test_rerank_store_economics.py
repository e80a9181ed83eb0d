"""Rerank-store refresh economics: capacity-plan dtype, donated appends,
and the stale-snapshot retry.

Round-4 findings these tests pin down (VERDICT r4 items 2 and 5):
- the store dtype is decided from the CAPACITY plan at ONE copy — the
  old rule budgeted a two-copy append transient (csr.append_rows was not
  donated), halving f32 capacity and OOMing 2 x 11.8 GB at 10.5M x 256;
- a dtype flip can only coincide with a capacity change (which is a full
  rebuild anyway), so no append triggers a flip-rebuild on its own;
- queries that race a donating refresh retry on a fresh snapshot.
"""

import numpy as np
import pytest

import columbiaimagesearch_tpu.index.searcher as searcher_mod
from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU


@pytest.fixture
def hbm_limit():
    """Set a fake device HBM size; restore the lazy cache after."""
    def set_limit(v):
        searcher_mod._HBM_LIMIT = v

    yield set_limit
    searcher_mod._HBM_LIMIT = None


def test_plan_dtype_one_copy_budget(hbm_limit):
    import jax.numpy as jnp

    hbm_limit(15.75e9)  # v5e
    cap, Dr = 11534336, 256  # the 10.5M production capacity plan
    # ONE f32 copy = 11.8e9 <= 13.5e9 budget -> float32. The old two-copy
    # rule (2 * 4 * cap * Dr > budget) would have picked bfloat16 here —
    # this is the capacity-plan assertion that the transient is gone.
    assert 2 * 4 * cap * Dr > LOPQSearcherTPU.rerank_f32_budget()
    assert (LOPQSearcherTPU._plan_rerank_dtype("auto", cap, Dr)
            == jnp.float32)
    # Past one-copy capacity the auto plan falls back to bfloat16.
    assert (LOPQSearcherTPU._plan_rerank_dtype("auto", 4 * cap, Dr)
            == jnp.bfloat16)
    # Explicit pins are honored regardless of capacity.
    assert (LOPQSearcherTPU._plan_rerank_dtype("bfloat16", 8, Dr)
            == jnp.bfloat16)
    assert (LOPQSearcherTPU._plan_rerank_dtype("float32", 10 * cap, Dr)
            == jnp.float32)


def test_plan_dtype_depends_only_on_capacity(hbm_limit):
    """The decision is a pure function of (cap, Dr): appends that do not
    grow capacity can never flip the dtype (no flip-rebuild on append)."""
    hbm_limit(15.75e9)
    for cap in (1 << 10, 1 << 20, 11534336, 1 << 25):
        a = LOPQSearcherTPU._plan_rerank_dtype("auto", cap, 256)
        b = LOPQSearcherTPU._plan_rerank_dtype("auto", cap, 256)
        assert a == b


def test_hbm_limit_fallback_on_cpu():
    """On non-TPU backends the budget falls back to the v5e constant
    (the heuristics were measured there; host-RAM 'budgets' would
    disable them in tests)."""
    searcher_mod._HBM_LIMIT = None
    try:
        assert searcher_mod.hbm_bytes_limit() == pytest.approx(15.75e9)
        # The derived constants reproduce the r04 measured-safe budgets.
        assert LOPQSearcherTPU.rerank_f32_budget() == pytest.approx(13.5e9)
        assert LOPQSearcherTPU._wave_cap_bytes(0.0, 1024) \
            == LOPQSearcherTPU._wave_cap_bytes(0.0, 1024)
    finally:
        searcher_mod._HBM_LIMIT = None


def _tiny_model(rng, D=16, V=4, M=4):
    X = rng.rand(2000, D).astype(np.float32)
    model = LOPQModel(V=V, M=M, subquantizer_clusters=16)
    model.fit(X, n_init=1, random_state=0, kmeans_coarse_iters=4,
              kmeans_local_iters=4)
    return model, X


def test_stale_snapshot_retry_recovers():
    """A query holding a snapshot whose store buffer was donated away
    (simulated via Array.delete) retries once on a fresh snapshot and
    succeeds — the contract that makes donated appends safe under the
    threaded serving API."""
    rng = np.random.RandomState(0)
    model, X = _tiny_model(rng)
    s = LOPQSearcherTPU(model)
    s.add_data(X[:500], store_feats=True)
    stale = s._snapshot()  # consistent view pre-append

    # A refresh lands (donating the old feats buffer on TPU); simulate
    # the donation by deleting the stale snapshot's buffer.
    s.add_data(X[500:600], ids=[f"n{i}" for i in range(100)],
               store_feats=True)
    s._pack()
    stale[0]["feats"].delete()

    calls = {"n": 0}
    real_snapshot = s._snapshot

    def racy_snapshot():
        calls["n"] += 1
        if calls["n"] == 1:
            return stale
        return real_snapshot()

    s._snapshot = racy_snapshot
    try:
        out = s.search_batch(X[:3], quota=50, limit=5, with_dists=True,
                             rerank_nb=10)
    finally:
        del s._snapshot
    assert calls["n"] >= 2, "query must have retried on a fresh snapshot"
    assert len(out) == 3
    assert all(len(res) > 0 for res, _ in out)


def test_mesh_store_dtype_plan(hbm_limit):
    """ShardedLOPQIndex applies the same one-copy capacity plan PER
    SHARD; bfloat16 kicks in when one shard's slice exceeds the budget."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.parallel.mesh import SHARD_AXIS, make_mesh

    rng = np.random.RandomState(1)
    model, X = _tiny_model(rng)
    mesh = make_mesh(axis=SHARD_AXIS)
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    # Budget that a [cap_per, D] f32 slice exceeds -> auto picks bf16.
    idx = ShardedLOPQIndex(model, mesh=mesh)
    coarse, fine = model.predict_batch(X[:512])
    hbm_limit(2.25e9 + 1000.0)  # rerank budget ~= 1 KB
    idx.build(coarse, fine, feats=X[:512, :16].astype(np.float32))
    assert idx._buf_feats.dtype == jnp.bfloat16
    out = idx.search_batch(X[:2], quota=50, limit=5, rerank_nb=8)
    assert len(out) == 2 and all(len(p) > 0 for p, _ in out)

    # Roomy budget -> float32 slices.
    hbm_limit(15.75e9)
    idx2 = ShardedLOPQIndex(model, mesh=mesh)
    idx2.build(coarse, fine, feats=X[:512, :16].astype(np.float32))
    assert idx2._buf_feats.dtype == jnp.float32


def test_facade_wires_dtype_and_capacity_knobs():
    """SearcherLOPQ passes the operator-facing rerank_dtype/capacity_hint
    conf knobs through to the device searcher (and the factory reads
    them from prefixed conf keys): the bf16-vs-f32 trade (3.29 vs
    6.08 ms e2e p50 at 10.5M x 256, r4/r5 artifacts) must be choosable
    per deployment, not only by the auto HBM plan."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.common.factory import build_searcher
    from columbiaimagesearch_tpu.store.kvindexer import KVIndexer
    from columbiaimagesearch_tpu.store.storer import MemoryStorer

    rng = np.random.RandomState(0)
    model, X = _tiny_model(rng)

    conf = {"SEARCHLOPQ_model_type": "lopq", "SEARCHLOPQ_lopq_V": model.V,
            "SEARCHLOPQ_lopq_M": model.M,
            "SEARCHLOPQ_store_rerank_feats": True,
            "SEARCHLOPQ_rerank_dtype": "bfloat16",
            "SEARCHLOPQ_capacity_hint": 4096}
    fac = build_searcher(conf, indexer=KVIndexer(":memory:"),
                         storer=MemoryStorer())
    assert fac.rerank_dtype == "bfloat16"
    assert fac.capacity_hint == 4096
    fac.model = model
    fac._init_device_searcher()
    assert fac.searcher.rerank_dtype == "bfloat16"
    assert fac.searcher.capacity_hint == 4096

    fac.searcher.add_data(X[:300], store_feats=True)
    fac.searcher._pack()
    dev, *_ = fac.searcher._snapshot()
    assert dev["feats"].dtype == jnp.bfloat16
