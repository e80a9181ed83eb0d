"""In-place capacity-padded host mirror of LOPQSearcherTPU.

The reference's incremental ``load_codes`` append is cheap
(reference: cufacesearch/searcher/searcher_lopqhbase.py:655-770); here a
per-append ``np.concatenate`` would rewrite the whole host mirror
(10.7 GB at 10.5M x 256), which measured ~100 s per 8k-row refresh on the
dev host. These tests pin the economics (append does NOT reallocate the
mirror until capacity is exceeded) and the concurrency contract (a
snapshot taken before an append still reads consistent rows, because
appends only write PAST the snapshot's prefix and growth swaps in fresh
base arrays).
"""

import numpy as np

from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher, LOPQSearcherTPU

from tests.oracle_lopq import random_params


def _mk(rng, V=32, M=4, S=16, D=16):
    params = random_params(rng, V=V, M=M, S=S, D=D)
    return LOPQModel(parameters=params), params


def _codes(rng, n, V, M, S):
    coarse = rng.randint(0, V, (n, 2))
    fine = rng.randint(0, S, (n, M))
    return coarse, fine


def test_append_is_in_place_until_capacity():
    rng = np.random.RandomState(0)
    V, M, S = 32, 4, 16
    model, _ = _mk(rng, V=V, M=M, S=S)
    s = LOPQSearcherTPU(model)
    s.add_codes(_codes(rng, 1000, V, M, S))
    s._pack_locked()
    base_cells = s._cells
    base_fine = s._fine
    cap = s._host_cap
    assert cap >= 1000
    # Appends within capacity must reuse the SAME base arrays (O(k) write,
    # no mirror rewrite) — the refresh-economics contract.
    for _ in range(3):
        s.add_codes(_codes(rng, 50, V, M, S))
        s._pack_locked()
        assert s._cells is base_cells
        assert s._fine is base_fine
        assert s._host_cap == cap
    assert s.nb_indexed == 1150


def test_capacity_growth_preserves_rows_and_old_snapshot():
    rng = np.random.RandomState(1)
    V, M, S = 32, 4, 16
    model, _ = _mk(rng, V=V, M=M, S=S)
    s = LOPQSearcherTPU(model)
    c0, f0 = _codes(rng, 600, V, M, S)
    s.add_codes((c0, f0))
    s._pack_locked()
    dev, ids, cells, fine, n = s._snapshot()
    cells_before = cells.copy()
    fine_before = fine.copy()
    # Force growth well past the current capacity.
    big = s._host_cap + 5000
    s.add_codes(_codes(rng, big, V, M, S))
    s._pack_locked()
    assert s.nb_indexed == 600 + big
    assert s._host_cap >= 600 + big
    # The grown mirror keeps the original prefix...
    np.testing.assert_array_equal(s._cells[:600],
                                  c0[:, 0] * V + c0[:, 1])
    np.testing.assert_array_equal(s._fine[:600], f0)
    # ...and the PRE-growth snapshot views are untouched (readers racing
    # a growing append stay consistent).
    np.testing.assert_array_equal(cells, cells_before)
    np.testing.assert_array_equal(fine, fine_before)
    assert n == 600


def test_snapshot_prefix_immune_to_concurrent_append():
    rng = np.random.RandomState(2)
    V, M, S = 32, 4, 16
    model, _ = _mk(rng, V=V, M=M, S=S)
    s = LOPQSearcherTPU(model)
    s.add_codes(_codes(rng, 500, V, M, S))
    _, ids, cells, fine, n = s._snapshot()
    c_copy, f_copy = cells.copy(), fine.copy()
    # In-capacity append (writes rows [500, 560) of the same base array).
    s.add_codes(_codes(rng, 60, V, M, S))
    s._pack_locked()
    np.testing.assert_array_equal(cells, c_copy)
    np.testing.assert_array_equal(fine, f_copy)
    assert len(cells) == n == 500


def test_explicit_ids_upgrade_and_query_parity():
    """Identity-int ids mirror upgrades to object dtype on the first
    explicit-id append, and query results keep referencing the right
    ids across the upgrade."""
    rng = np.random.RandomState(3)
    V, M, S, D = 32, 4, 16, 16
    model, params = _mk(rng, V=V, M=M, S=S, D=D)
    s = LOPQSearcherTPU(model)
    host = LOPQSearcher(model)
    c0, f0 = _codes(rng, 300, V, M, S)
    s.add_codes((c0, f0))                       # identity ids 0..299
    host.add_codes((c0, f0), list(range(300)))
    s._pack_locked()
    assert s._ids.dtype != object
    c1, f1 = _codes(rng, 40, V, M, S)
    named = [f"img_{i}" for i in range(40)]
    s.add_codes((c1, f1), named)                # triggers object upgrade
    host.add_codes((c1, f1), named)
    s._pack_locked()
    assert s._ids.dtype == object
    assert list(s._ids[:3]) == [0, 1, 2]
    assert s._ids[300] == "img_0"
    q = rng.randn(D).astype(np.float32)
    got, _ = s.search(q, quota=340, limit=340, with_dists=True)
    want, _ = host.search(q, quota=340, limit=340, with_dists=True)
    assert {r.id for r in got} == {r.id for r in want}


def test_feats_mirror_in_place_append_rerank_parity():
    """The rerank feature mirror follows the same in-place contract and
    fused rerank stays exact across appends."""
    rng = np.random.RandomState(4)
    V, M, S, D = 32, 4, 16, 16
    model, _ = _mk(rng, V=V, M=M, S=S, D=D)
    s = LOPQSearcherTPU(model)
    c0, f0 = _codes(rng, 400, V, M, S)
    X0 = rng.randn(400, D).astype(np.float32)
    s.add_codes((c0, f0), feats=X0)
    s._pack_locked()
    base_feats = s._feats
    c1, f1 = _codes(rng, 30, V, M, S)
    X1 = rng.randn(30, D).astype(np.float32)
    s.add_codes((c1, f1), feats=X1)
    s._pack_locked()
    assert s._feats is base_feats
    np.testing.assert_array_equal(s._feats[:400], X0)
    np.testing.assert_array_equal(s._feats[400:430], X1)
    q = rng.randn(D).astype(np.float32)
    res, _ = s.search(q, quota=430, limit=5, with_dists=True,
                      rerank_nb=430)
    X = np.concatenate([X0, X1])
    exact = ((X - q[None]) ** 2).sum(1)
    want = set(np.argsort(exact, kind="stable")[:5].tolist())
    assert {r.id for r in res} == want


def test_chunk_waves_oom_backoff(monkeypatch):
    """A wave chunk that exhausts HBM halves the process-wide cap and
    retries at the smaller bucket instead of failing the query (the r05
    100M B=64 wave OOMed at an estimated-safe cap)."""
    monkeypatch.setattr(LOPQSearcherTPU, "_WAVE_OOM_SHRINK", 1)
    calls = []

    def run_tier(idx, rung):
        calls.append(len(idx))
        if len(idx) > 16:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        k = len(idx)
        return tuple(np.full(k, i) for i in range(5))

    wrapped = LOPQSearcherTPU._chunk_waves(run_tier, 64)
    out = wrapped(list(range(64)), rung=0)
    assert all(len(o) == 64 for o in out)
    # First attempt at 64 OOMs, 2x32 OOM, then 4x16 succeed.
    assert calls[0] == 64
    assert LOPQSearcherTPU._WAVE_OOM_SHRINK == 4
    assert calls[-1] == 16
    # The learned shrink persists for the next wave: straight to 16s.
    calls.clear()
    out = wrapped(list(range(32)), rung=0)
    assert all(len(o) == 32 for o in out)
    assert calls == [16, 16]
    # A non-OOM error still propagates.
    def boom(idx, rung):
        raise ValueError("not an oom")
    try:
        LOPQSearcherTPU._chunk_waves(boom, 64)(list(range(8)), rung=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_chunk_waves_oom_shrinks_to_single_query(monkeypatch):
    """The backoff shrinks all the way to 1-query waves before giving
    up: with a ~11 GB resident f32 store the true free HBM undercuts the
    byte model's floor and even an 8-query wave can be too wide (the r05
    10.5M adversarial+rerank eval crash). Only an OOM AT cap 1 is
    terminal."""
    monkeypatch.setattr(LOPQSearcherTPU, "_WAVE_OOM_SHRINK", 1)
    calls = []

    def run_tier(idx, rung):
        calls.append(len(idx))
        if len(idx) > 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return tuple(np.full(1, i) for i in range(5))

    wrapped = LOPQSearcherTPU._chunk_waves(run_tier, 8)
    out = wrapped(list(range(8)), rung=0)
    assert all(len(o) == 8 for o in out)
    assert calls == [8, 4, 2, 1] + [1] * 7
    assert LOPQSearcherTPU._WAVE_OOM_SHRINK == 8

    monkeypatch.setattr(LOPQSearcherTPU, "_WAVE_OOM_SHRINK", 1)

    def always_oom(idx, rung):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
    try:
        LOPQSearcherTPU._chunk_waves(always_oom, 8)(list(range(8)), rung=0)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
