"""SearcherLOPQ with the sharded backend + codestore persistence."""

import numpy as np

from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
from columbiaimagesearch_tpu.store import MemoryStorer

from tests.test_store_searcher import make_indexer


def test_sharded_searcher_end_to_end():
    rng = np.random.RandomState(0)
    kv, feats, sha1s = make_indexer(rng, n_imgs=400)
    searcher = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=400, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        indexer=kv, storer=MemoryStorer(), sharded=True,
        reranking=True, rerank_nb=200)
    assert searcher.get_nb_indexed() == 400
    q = feats[55]
    out = searcher.search_from_feats(
        [(sha1s[55], None)], [q], {"max_returned": 5})
    block = out["AllSimilarImages"][0]["SimilarImages"]
    assert block["ImageSha1s"][0] == sha1s[55]
    assert block["Distances"][0] < 1e-3


def test_codestore_backed_searcher_restart(tmp_path):
    rng = np.random.RandomState(1)
    kv, feats, sha1s = make_indexer(rng, n_imgs=300)
    storer = MemoryStorer()
    cs_path = str(tmp_path / "codes.cs")
    s1 = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=300, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        indexer=kv, storer=storer, codestore_path=cs_path)
    assert s1.get_nb_indexed() == 300
    s1.searcher._codestore.close()

    # Restart with a fresh storer lacking code dicts: the codestore file
    # alone restores the index without recomputation.
    s2 = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=300, nb_min_train=100, train_at_init=False,
        model=storer.load(s1.build_model_str()),
        detector_type="full", featurizer_type="sentibank",
        indexer=None, storer=None, codestore_path=cs_path)
    assert s2.get_nb_indexed() == 300
    out = s2.search_from_feats([(sha1s[9], None)], [feats[9]],
                               {"max_returned": 3, "reranking": False})
    block = out["AllSimilarImages"][0]["SimilarImages"]
    assert sha1s[9] in block["ImageSha1s"]


def test_sharded_incremental_append_matches_host():
    """Device-side shard_map append: three refresh rounds (with duplicate
    re-insertions) must match the host parity searcher."""
    from tests.oracle_lopq import random_params

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcher
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQSearcher

    rs = np.random.RandomState(11)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(480, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = np.asarray([f"s{i}" for i in range(480)], dtype=object)

    sharded = ShardedLOPQSearcher(model)
    host = LOPQSearcher(model)
    slices = [(0, 200), (200, 400), (400, 480)]
    for a, b in slices:
        sharded.add_codes((coarse[a:b], fine[a:b]), ids[a:b])
        host.add_codes((coarse[a:b], fine[a:b]), ids[a:b])
        # re-insert a duplicate block: must be dropped by both
        sharded.add_codes((coarse[:50], fine[:50]), ids[:50])
        host.add_codes((coarse[:50], fine[:50]), ids[:50])
        assert sharded.get_nb_indexed() == host.get_nb_indexed() == b
        for q in (1, 7):
            res_s, _ = sharded.search(X[q], quota=480, limit=5,
                                      with_dists=True)
            res_h, _ = host.search(X[q], quota=480, limit=5,
                                   with_dists=True)
            assert [r.id for r in res_s] == [r.id for r in res_h], (a, b, q)
            np.testing.assert_allclose([r.dist for r in res_s],
                                       [r.dist for r in res_h], rtol=1e-4)


def test_sharded_brute_plan_exact(monkeypatch):
    """Mesh-wide brute plan: exact true-L2 top-k over the sharded feature
    store, matching a numpy oracle and the grid+rerank plan."""
    from tests.oracle_lopq import random_params

    from columbiaimagesearch_tpu.index import tpu_query
    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rs = np.random.RandomState(13)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(500, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = np.asarray([f"s{i}" for i in range(500)], dtype=object)

    idx = ShardedLOPQIndex(model)
    idx.build(np.asarray(coarse, np.int32).reshape(500, 2),
              np.asarray(fine, np.int32), ids=ids, feats=X)

    Q = X[[3, 77, 411]] + 0.05 * rs.randn(3, 32).astype(np.float32)

    monkeypatch.setattr(tpu_query, "prefer_brute",
                        lambda *a, **k: True)
    out_brute = idx.search_batch(Q, quota=500, limit=5, rerank_nb=64)
    assert idx.probe_stats.get("brute_waves", 0) == 1

    # Numpy oracle: exact L2 over all rows.
    for qi, (pairs, _cells) in enumerate(out_brute):
        d = np.linalg.norm(X - Q[qi][None, :], axis=1)
        want = np.argsort(d, kind="stable")[:5]
        got_ids = [p[0] for p in pairs]
        assert got_ids == [f"s{i}" for i in want], (qi, got_ids, want)
        np.testing.assert_allclose([p[1] for p in pairs], d[want],
                                   rtol=1e-5)

    # Grid + mesh rerank plan still runs (plan forced off brute) and
    # honors ITS contract: true-L2 distances for whatever ids it ranks
    # (the id SETS may differ — grid rerank is exact over its top-R-by-
    # ADC candidates only, and with random codebooks ADC ordering is
    # uninformative; brute is exact over all rows).
    monkeypatch.setattr(tpu_query, "prefer_brute",
                        lambda *a, **k: False)
    out_grid = idx.search_batch(Q, quota=500, limit=5, rerank_nb=64)
    assert idx.probe_stats.get("brute_waves", 0) == 1  # unchanged
    for qi, (pg, _cells) in enumerate(out_grid):
        rows = [int(p[0][1:]) for p in pg]
        want = np.linalg.norm(X[rows] - Q[qi][None, :], axis=1)
        np.testing.assert_allclose([p[1] for p in pg], want, rtol=1e-4)


def test_sharded_brute_after_append(monkeypatch):
    """feats_sq snapshot cache refreshes after an incremental append."""
    from tests.oracle_lopq import random_params

    from columbiaimagesearch_tpu.index import tpu_query
    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rs = np.random.RandomState(14)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(300, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)

    idx = ShardedLOPQIndex(model)
    monkeypatch.setattr(tpu_query, "prefer_brute", lambda *a, **k: True)
    idx.build(np.asarray(coarse, np.int32).reshape(-1, 2)[:200],
              np.asarray(fine, np.int32)[:200],
              ids=np.asarray([f"a{i}" for i in range(200)], dtype=object),
              feats=X[:200])
    idx.search_batch(X[[5]], quota=300, limit=3, rerank_nb=32)

    co2 = np.asarray(coarse, np.int32).reshape(-1, 2)[200:]
    idx.append(co2, np.asarray(fine, np.int32)[200:],
               ids=np.asarray([f"a{i}" for i in range(200, 300)],
                              dtype=object), feats=X[200:])
    out = idx.search_batch(X[[250]], quota=300, limit=3, rerank_nb=32)
    pairs, _ = out[0]
    assert pairs[0][0] == "a250" and pairs[0][1] < 1e-3


def test_sharded_retry_blocks_on_inflight_upload():
    """The one stale-snapshot retry must see the POST-swap device dict:
    _search_batch_impl snapshots under the swap lock, which a donating
    upload holds for its whole mutation. Regression for the r5 review
    finding (unsynchronized retry could re-read the same stale dict)."""
    import threading
    import time as _time

    from tests.oracle_lopq import random_params

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rs = np.random.RandomState(5)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(400, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    idx = ShardedLOPQIndex(model)
    idx.build(np.asarray(coarse, np.int32).reshape(-1, 2),
              np.asarray(fine, np.int32), feats=X)
    idx.search_batch(X[:2], quota=50, limit=3)  # compile once

    got = {}

    def query():
        got["out"] = idx.search_batch(X[:2], quota=50, limit=3)
        got["t"] = _time.perf_counter()

    # Hold the swap lock as an in-flight upload would; the query must
    # block until release instead of racing a half-swapped state.
    with idx._swaplock:
        t = threading.Thread(target=query)
        t.start()
        _time.sleep(0.3)
        assert "out" not in got, "query must block on the swap lock"
        released = _time.perf_counter()
    t.join(10)
    assert got["t"] >= released
    assert len(got["out"]) == 2 and len(got["out"][0][0]) == 3


def test_sharded_capacity_plan_amortizes_appends():
    """An 8k-row append on a sizeable index must not grow the host
    mirror or the per-shard device buffers: both follow the shared
    size-scaled capacity plan (+ capacity_hint), so refreshes never pay
    a full realloc/rewrite (the ~100 s/refresh class of r04)."""
    from tests.oracle_lopq import random_params

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQIndex

    rs = np.random.RandomState(6)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    idx = ShardedLOPQIndex(model, capacity_hint=200_000)

    X = rs.randn(4096, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    idx.build(np.asarray(coarse, np.int32).reshape(-1, 2),
              np.asarray(fine, np.int32), feats=X)
    cap_host0, cap_per0 = idx._host_capn, idx._cap_per
    assert cap_host0 >= 200_000  # hint honored

    base_c, base_f = idx._cells_host, idx._feats_host
    for _ in range(3):
        Y = rs.randn(8192, 32).astype(np.float32)
        c2, f2 = model.predict_batch(Y)
        idx.append(np.asarray(c2, np.int32).reshape(-1, 2),
                   np.asarray(f2, np.int32), feats=Y)
    assert idx._host_capn == cap_host0
    assert idx._cap_per == cap_per0
    assert idx._cells_host is base_c      # in-place, no realloc
    assert idx._feats_host is base_f


def test_sharded_prewarm_ladder_compiles_without_state():
    """ShardedLOPQSearcher.prewarm_ladder drives every rung (and the
    mesh brute plan) at the serving geometry, returns the program count,
    and leaves probe stats / tier hint / yield EMA untouched."""
    from tests.oracle_lopq import random_params

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.index.tpu_query import probe_ladder
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQSearcher

    rs = np.random.RandomState(9)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(300, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    s = ShardedLOPQSearcher(model)
    s.add_codes((np.asarray(coarse, np.int32).reshape(-1, 2),
                 np.asarray(fine, np.int32)),
                ids=[f"p{i}" for i in range(300)], feats=X)

    n = s.prewarm_ladder(quota=50, limit=5, rerank_nb=10, waves=(1, 3))
    n_rungs = len(probe_ladder(model.V, None))
    assert n == 2 * (n_rungs + 1)   # buckets {1, 4} x (ladder + brute)
    assert s.index.probe_stats["waves"] == 0
    assert s.index._tier_hint == 0 and s.index._yield_ema is None

    res, _vis = s.search(X[11], quota=100, limit=3, with_dists=True,
                         rerank_nb=16)
    assert res[0].id == "p11"


def test_sharded_prewarm_ladder_pca_model():
    """Sharded prewarm feeds ORIGINAL-dim zeros for PCA models — the
    impl applies PCA itself (sharded.py _search_batch_impl), so the
    prewarm query width must be pca_P.shape[0], not the index dim."""
    from columbiaimagesearch_tpu.index.model import LOPQModelPCA
    from columbiaimagesearch_tpu.index.tpu_query import probe_ladder
    from columbiaimagesearch_tpu.parallel.sharded import ShardedLOPQSearcher

    rng = np.random.RandomState(21)
    raw = rng.rand(400, 48).astype(np.float32)
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    pm = LOPQModelPCA(V=8, M=4, subquantizer_clusters=16)
    pm.fit(raw, pca_dims=16, kmeans_coarse_iters=2, kmeans_local_iters=2,
           n_init=1, random_state=0)
    coarse, fine = pm.predict_batch(raw)
    s = ShardedLOPQSearcher(pm)
    s.add_codes((np.asarray(coarse, np.int32).reshape(-1, 2),
                 np.asarray(fine, np.int32)),
                ids=[f"p{i}" for i in range(400)])

    n = s.prewarm_ladder(quota=20, limit=5, waves=(1,))
    assert n == len(probe_ladder(pm.V, s.index.probe_width))
    assert s.index.probe_stats["waves"] == 0

    res, _vis = s.search(raw[7], quota=400, limit=3, with_dists=True)
    assert any(r.id == "p7" for r in res)
