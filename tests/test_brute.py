"""Brute exact-path tests (tpu_query.brute_query_batch + searcher wiring).

The brute path serves rerank-mode waves with one exact MXU pass over the
resident feature store — the quota -> nb limit of the reference's
probe-then-rerank contract (lopq/lopq/search.py:110-135 quota walk +
searcher_lopqhbase.py:862-912 rerank). Cross-checked against a numpy
exact-L2 oracle, never against the grid kernel.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_index():
    from columbiaimagesearch_tpu.index.model import LOPQModel

    rng = np.random.RandomState(3)
    centers = rng.randn(32, 32).astype(np.float32) * 5
    X = (centers[rng.randint(0, 32, 5000)]
         + rng.randn(5000, 32).astype(np.float32))
    m = LOPQModel(V=8, M=4, subquantizer_clusters=16)
    m.fit(X, n_init=1, random_state=0)
    return m, X


def _exact_oracle(X, q, k):
    d = np.linalg.norm(X - q[None, :], axis=1)
    order = np.argsort(d, kind="stable")[:k]
    return order, d[order]


def test_brute_kernel_matches_exact_oracle(small_index):
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.tpu_query import (
        brute_query_batch,
        unpack_query_out,
    )

    _, X = small_index
    rng = np.random.RandomState(7)
    Q = X[rng.randint(0, len(X), 6)] + 0.05 * rng.randn(6, 32).astype(
        np.float32)
    feats = jnp.asarray(X)
    feats_sq = jnp.sum(feats * feats, axis=1)
    packed = np.asarray(brute_query_batch(
        jnp.asarray(Q), feats, feats_sq, jnp.int32(len(X)), jnp.int32(0),
        K_pre=64, K_out=10, QCH=4))
    rows, dists, total, _, ok = unpack_query_out(packed, 10)
    assert (total == len(X)).all() and (ok == 1).all()
    for i in range(len(Q)):
        oracle_rows, oracle_d = _exact_oracle(X, Q[i], 10)
        # Set equality up to distance ties; dists match to f32 tolerance.
        np.testing.assert_allclose(dists[i], oracle_d, rtol=1e-4,
                                   atol=1e-4)
        assert set(rows[i]) == set(oracle_rows)


def test_brute_kernel_capacity_padding(small_index):
    """Rows past nb (capacity pads, zero vectors) must never surface."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.tpu_query import (
        brute_query_batch,
        unpack_query_out,
    )

    _, X = small_index
    cap = len(X) + 513
    fbuf = np.zeros((cap, X.shape[1]), np.float32)
    fbuf[:len(X)] = X
    feats = jnp.asarray(fbuf)
    feats_sq = jnp.sum(feats * feats, axis=1)
    q = np.zeros((1, X.shape[1]), np.float32)  # zero query: pads would win
    packed = np.asarray(brute_query_batch(
        q, feats, feats_sq, jnp.int32(len(X)), jnp.int32(0),
        K_pre=32, K_out=5, QCH=1))
    rows, dists, _, _, _ = unpack_query_out(packed, 5)
    assert (rows[0] < len(X)).all() and (rows[0] >= 0).all()
    oracle_rows, oracle_d = _exact_oracle(X, q[0], 5)
    np.testing.assert_allclose(dists[0], oracle_d, rtol=1e-4, atol=1e-4)


def test_searcher_rerank_uses_brute_and_matches_oracle(small_index):
    """search_batch in rerank mode routes small-index waves to the brute
    plan (probe_stats['brute_waves']) and returns the true top-K."""
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    m, X = small_index
    s = LOPQSearcherTPU(m)
    s.add_data(X, store_feats=True)
    rng = np.random.RandomState(11)
    Q = X[rng.randint(0, len(X), 3)] + 0.05 * rng.randn(3, 32).astype(
        np.float32)
    out = s.search_batch(Q, quota=200, limit=5, rerank_nb=64,
                         with_dists=True)
    assert s.probe_stats.get("brute_waves", 0) >= 1
    for i in range(len(Q)):
        results, visited = out[i]
        assert visited > 0
        oracle_rows, oracle_d = _exact_oracle(X, Q[i], 5)
        got = [r.id for r in results]
        assert set(got) == set(oracle_rows)
        np.testing.assert_allclose([r.dist for r in results], oracle_d,
                                   rtol=1e-4, atol=1e-4)


def test_search_single_query_brute(small_index):
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    m, X = small_index
    s = LOPQSearcherTPU(m)
    s.add_data(X, store_feats=True)
    q = X[42] + 0.02 * np.random.RandomState(5).randn(32).astype(np.float32)
    results, visited = s.search(q, quota=200, limit=5, rerank_nb=64,
                                with_dists=True)
    oracle_rows, _ = _exact_oracle(X, q, 5)
    assert set(r.id for r in results) == set(oracle_rows)


def test_brute_vs_grid_rerank_same_contract(small_index):
    """Forcing the grid ladder (probe_width pin) at a quota that covers
    the whole index must agree with the brute plan: both are 'rerank the
    true candidate set' at that point."""
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    m, X = small_index
    s_brute = LOPQSearcherTPU(m)
    s_brute.add_data(X, store_feats=True)
    s_grid = LOPQSearcherTPU(m, probe_width=8)  # full V=8 grid, no brute
    s_grid.add_data(X, store_feats=True)
    q = X[7]
    rb, _ = s_brute.search(q, quota=len(X), limit=5, rerank_nb=256,
                           with_dists=True)
    rg, _ = s_grid.search(q, quota=len(X), limit=5, rerank_nb=256,
                          with_dists=True)
    assert s_brute.probe_stats.get("brute_waves", 0) >= 1
    assert s_grid.probe_stats.get("brute_waves", 0) == 0
    assert [r.id for r in rb] == [r.id for r in rg]
    np.testing.assert_allclose([r.dist for r in rb], [r.dist for r in rg],
                               rtol=1e-5, atol=1e-5)


def test_fused_feat_brute_matches_host_path(small_index):
    """The fused serving twin (normalize + PCA + brute) agrees with the
    host-projected brute kernel."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.model import LOPQModelPCA
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    m, X = small_index
    rng = np.random.RandomState(19)
    raw = rng.rand(4000, 48).astype(np.float32)
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    pm = LOPQModelPCA(V=8, M=4, subquantizer_clusters=16)
    pm.fit(raw, pca_dims=16, kmeans_coarse_iters=3,
           kmeans_local_iters=3, n_init=1, random_state=0)
    s = LOPQSearcherTPU(pm)
    s.add_data(raw, store_feats=True)
    d, _, _, _, nb = s._snapshot()

    from columbiaimagesearch_tpu.index.tpu_query import (
        fused_feat_brute,
        unpack_query_out,
    )

    Qraw = raw[:3] + 0.001 * rng.randn(3, 48).astype(np.float32)
    packed = np.asarray(fused_feat_brute(
        jnp.asarray(Qraw), d.get("pca_P"), d.get("pca_mu"), d["feats"],
        d["feats_sq"], jnp.int32(nb), d["n_occ"], K_pre=32, K_out=5,
        renorm=bool(getattr(pm, "renorm", False))))
    rows, dists, _, _, _ = unpack_query_out(packed, 5)

    out = s.search_batch(Qraw_proj(pm, Qraw), quota=200, limit=5,
                         rerank_nb=32, with_dists=True)
    for i in range(3):
        assert set(rows[i]) == set(r.id for r in out[i][0])


def Qraw_proj(pm, Qraw):
    Qn = Qraw / np.maximum(
        np.linalg.norm(Qraw, axis=1, keepdims=True), 1e-30)
    return Qn
