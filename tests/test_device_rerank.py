"""Device-resident exact rerank parity.

The reference's production config serves with ``reranking: true``
(reference: conf/conf_search_sbpycaffe_release.json:16): take the top
``rerank_nb`` ADC candidates, recompute exact distances against the stored
features, re-sort (reference: searcher_lopqhbase.py:862-912). Here the
feature matrix is HBM-resident and the rerank fuses into the query program;
these tests check the fused path against an independent numpy oracle (ADC
ranking from the host searcher + numpy exact distances), and the
store-consistency rules (one featureless add drops the store).
"""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQModel, LOPQModelPCA
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher, LOPQSearcherTPU

from tests.oracle_lopq import random_params


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(3)
    V, M, S, D = 16, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 3000
    X = rng.randn(n, D).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = [f"it_{i}" for i in range(n)]
    queries = rng.randn(5, D).astype(np.float32)
    return model, params, X, coarse, fine, ids, queries


def oracle_rerank(model, X, coarse, fine, ids, q, quota, rerank_nb, limit,
                  q_exact=None):
    """Independent oracle: host-searcher ADC ranking -> numpy exact
    re-score of the top rerank_nb -> stable re-sort -> truncate.
    ``q`` feeds the searcher (raw space); ``q_exact`` (default ``q``) is
    the index-space query the exact distances compare against."""
    if q_exact is None:
        q_exact = q
    s_host = LOPQSearcher(model)
    s_host.add_codes((coarse, fine), ids)
    r_adc, _ = s_host.search(q, quota=quota,
                             limit=max(limit, rerank_nb), with_dists=True)
    row_of = {ids[i]: i for i in range(len(ids))}
    cand = [r.id for r in r_adc][:rerank_nb]
    exact = np.asarray([np.linalg.norm(X[row_of[c]] - q_exact)
                        for c in cand])
    order = np.argsort(exact, kind="stable")
    return ([cand[i] for i in order[:limit]],
            exact[order[:limit]])


def test_search_batch_rerank_matches_oracle(setup):
    # probe_width pins the grid path: the quota-limited rerank contract
    # under test. The default plan routes small rerank waves to the brute
    # exact path (true top-K, a strictly better set) — tests/test_brute.py
    # covers that contract.
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model, probe_width=16)
    s.add_codes((coarse, fine), ids, feats=X)
    assert s.has_rerank_feats
    waves = s.search_batch(queries, quota=200, limit=50, with_dists=True,
                           rerank_nb=30)
    for q, (results, _) in zip(queries, waves):
        want_ids, want_d = oracle_rerank(model, X, coarse, fine, ids, q,
                                         quota=200, rerank_nb=30, limit=30)
        got_ids = [r.id for r in results]
        got_d = [r.dist for r in results]
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)
        # ids agree except float-tie swaps
        for i, (a, b) in enumerate(zip(got_ids, want_ids)):
            if a != b:
                assert abs(got_d[i] - want_d[i]) < 1e-4


def test_search_single_rerank(setup):
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model, probe_width=16)  # grid path (see above)
    s.add_codes((coarse, fine), ids, feats=X)
    results, _ = s.search(queries[0], quota=200, limit=50, with_dists=True,
                          rerank_nb=20)
    want_ids, want_d = oracle_rerank(model, X, coarse, fine, ids,
                                     queries[0], quota=200, rerank_nb=20,
                                     limit=20)
    np.testing.assert_allclose([r.dist for r in results], want_d,
                               rtol=1e-4, atol=1e-5)


def test_adaptive_ladder_rerank_matches_oracle(setup, monkeypatch):
    """The ADAPTIVE ladder's fused rerank (grid escalation + device
    re-sort) still matches the quota-limited oracle when the brute plan
    is disabled — covers the production path the cost model picks for
    large-index single-query waves."""
    import columbiaimagesearch_tpu.index.tpu_query as tq

    monkeypatch.setattr(tq, "prefer_brute",
                        lambda *a, **k: False)
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids, feats=X)
    waves = s.search_batch(queries[:2], quota=200, limit=30,
                           with_dists=True, rerank_nb=30)
    assert s.probe_stats.get("brute_waves", 0) == 0
    for q, (results, _) in zip(queries[:2], waves):
        want_ids, want_d = oracle_rerank(model, X, coarse, fine, ids, q,
                                         quota=200, rerank_nb=30, limit=30)
        got_d = [r.dist for r in results]
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)
        for i, (a, b) in enumerate(zip([r.id for r in results],
                                       want_ids)):
            if a != b:  # float-tie swaps only
                assert abs(got_d[i] - want_d[i]) < 1e-4


def test_rerank_without_store_raises(setup):
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids)  # no feats
    assert not s.has_rerank_feats
    with pytest.raises(ValueError, match="feature store"):
        s.search_batch(queries, quota=100, limit=10, rerank_nb=10)


def test_mixed_adds_drop_store(setup):
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse[:100], fine[:100]), ids[:100], feats=X[:100])
    assert s.has_rerank_feats
    s.add_codes((coarse[100:200], fine[100:200]),
                [f"nofeat_{i}" for i in range(100)])
    assert not s.has_rerank_feats


def test_incremental_append_keeps_feats_aligned(setup):
    """Feats appended across refreshes stay row-aligned with codes: a
    query whose nearest exact neighbor arrived in the SECOND append must
    rerank it to the top with the right distance."""
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse[:2000], fine[:2000]), ids[:2000], feats=X[:2000])
    _ = s.get_nb_indexed()  # force first pack
    s.add_codes((coarse[2000:], fine[2000:]), ids[2000:], feats=X[2000:])
    assert s.get_nb_indexed() == len(ids)
    # query sitting exactly on a row from the second chunk
    target = 2500
    q = X[target]
    results, _ = s.search_batch(q[None], quota=300, limit=20,
                                with_dists=True, rerank_nb=20)[0]
    assert results, "no results"
    assert results[0].id == ids[target]
    np.testing.assert_allclose(results[0].dist, 0.0, atol=1e-4)


def test_pca_fused_device_feats_rerank():
    """lopq_pca: raw 64-d features -> fused normalize/PCA/query/rerank on
    device matches the oracle computed in the projected space."""
    import jax.numpy as jnp

    rng = np.random.RandomState(9)
    D_raw, n = 64, 2000
    X_raw = rng.randn(n, D_raw).astype(np.float32)
    X_raw /= np.linalg.norm(X_raw, axis=1, keepdims=True)
    model = LOPQModelPCA(V=8, M=4, subquantizer_clusters=16)
    model.fit(X_raw, pca_dims=16, n_init=1, random_state=0,
              kmeans_coarse_iters=4, kmeans_local_iters=4)
    Xp = model.apply_PCA(X_raw)
    coarse, fine = model.predict_batch(X_raw)
    ids = [f"p_{i}" for i in range(n)]

    s = LOPQSearcherTPU(model, probe_width=8)  # grid path (see above)
    s.add_codes((coarse, fine), ids, feats=Xp)
    q_raw = X_raw[123] * 2.5  # un-normalized raw feature
    waves = s.search_device_feats(jnp.asarray(q_raw[None]), quota=300,
                                  limit=20, rerank_nb=20)
    results, _ = waves[0]
    assert results and results[0].id == ids[123]
    qn = q_raw / np.linalg.norm(q_raw)
    qp = np.squeeze(model.apply_PCA(qn))
    want_ids, want_d = oracle_rerank(model, Xp, coarse, fine, ids,
                                     qn, quota=300,
                                     rerank_nb=20, limit=20, q_exact=qp)
    np.testing.assert_allclose([r.dist for r in results], want_d,
                               rtol=1e-4, atol=1e-5)


def test_sharded_rerank_matches_exact_order():
    """Mesh path: rerank across shards returns exact distances in sorted
    order and finds the planted exact neighbor."""
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rng = np.random.RandomState(5)
    V, M, S, D = 16, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 2000
    X = rng.randn(n, D).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = [f"sh_{i}" for i in range(n)]

    idx = ShardedLOPQIndex(model)
    idx.build(coarse, fine, ids, feats=X)
    assert idx.has_rerank_feats
    q = X[777]
    waves = idx.search_batch(q[None], quota=300, limit=20, rerank_nb=20)
    pairs, _ = waves[0]
    assert pairs and pairs[0][0] == ids[777]
    np.testing.assert_allclose(pairs[0][1], 0.0, atol=1e-4)
    d = np.asarray([p[1] for p in pairs])
    assert np.all(np.diff(d) >= -1e-6)  # sorted by exact distance
    row_of = {ids[i]: i for i in range(n)}
    for rid, dist in pairs[:5]:
        np.testing.assert_allclose(
            dist, np.linalg.norm(X[row_of[rid]] - q), rtol=1e-4, atol=1e-5)


def test_sharded_incremental_feats_append():
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rng = np.random.RandomState(6)
    V, M, S, D = 16, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    X = rng.randn(1500, D).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = [f"in_{i}" for i in range(len(X))]

    idx = ShardedLOPQIndex(model)
    idx.build(coarse[:1000], fine[:1000], ids[:1000], feats=X[:1000])
    idx.append(coarse[1000:], fine[1000:], ids[1000:], feats=X[1000:])
    assert idx.has_rerank_feats and idx.nb_indexed == 1500
    q = X[1234]
    pairs, _ = idx.search(q, quota=300, limit=10, rerank_nb=10)
    assert pairs[0][0] == ids[1234]
    np.testing.assert_allclose(pairs[0][1], 0.0, atol=1e-4)
    # a featureless append drops the store
    idx.append(coarse[:1], fine[:1], ["extra_0"])
    assert not idx.has_rerank_feats


def test_rerank_depth_decoupled_from_output_limit(setup):
    """Serving shape: limit (output rows) < rerank_nb (re-score depth).
    The kernel re-scores the full depth but emits only ~limit rows
    (index/searcher._query_geometry K_out); results must equal the
    truncated full-depth oracle, for both batch and single paths."""
    model, params, X, coarse, fine, ids, queries = setup
    s = LOPQSearcherTPU(model, probe_width=16)  # grid path (see above)
    s.add_codes((coarse, fine), ids, feats=X)
    for path in ("batch", "single"):
        for q in queries[:3]:
            if path == "batch":
                results, _ = s.search_batch(
                    q[None], quota=300, limit=10, with_dists=True,
                    rerank_nb=100)[0]
            else:
                results, _ = s.search(q, quota=300, limit=10,
                                      with_dists=True, rerank_nb=100)
            want_ids, want_d = oracle_rerank(
                model, X, coarse, fine, ids, q, quota=300,
                rerank_nb=100, limit=10)
            got_d = [r.dist for r in results]
            assert len(results) == len(want_ids) == 10
            np.testing.assert_allclose(got_d, want_d, rtol=1e-4,
                                       atol=1e-5)
            for i, (a, b) in enumerate(zip([r.id for r in results],
                                           want_ids)):
                if a != b:  # float-tie swaps only
                    assert abs(got_d[i] - want_d[i]) < 1e-4


def test_sharded_rerank_depth_decoupled():
    """Mesh path: limit < rerank_nb emits only ~limit rows after the
    mesh-wide exact re-sort; equals the truncated full-depth results."""
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rng = np.random.RandomState(11)
    V, M, S, D = 16, 4, 16, 32
    params = random_params(rng, V=V, M=M, S=S, D=D)
    model = LOPQModel(parameters=params)
    n = 2000
    X = rng.randn(n, D).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = [f"sd_{i}" for i in range(n)]
    idx = ShardedLOPQIndex(model)
    idx.build(coarse, fine, ids, feats=X)
    q = X[321]
    full = idx.search_batch(q[None], quota=400, limit=80, rerank_nb=80)
    small = idx.search_batch(q[None], quota=400, limit=8, rerank_nb=80)
    pairs_f, _ = full[0]
    pairs_s, _ = small[0]
    assert len(pairs_s) == 8
    assert [p[0] for p in pairs_s] == [p[0] for p in pairs_f][:8]
    np.testing.assert_allclose([p[1] for p in pairs_s],
                               [p[1] for p in pairs_f][:8],
                               rtol=1e-5, atol=1e-6)
    assert pairs_s[0][0] == ids[321]
