"""Multisequence + searcher tests: ordering, parity, dedup, recall."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.eval import compute_all_neighbors, get_recall
from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.multisequence import multisequence
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher, LOPQSearcherTPU

from tests.oracle_lopq import adc_distance, random_params


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(21)
    params = random_params(rng, V=8, M=4, S=16, D=32)
    model = LOPQModel(parameters=params)
    X = rng.randn(2000, 32).astype(np.float32)
    queries = rng.randn(20, 32).astype(np.float32)
    return model, params, X, queries


def test_multisequence_visits_all_cells_in_distance_order(setup):
    model, params, _, queries = setup
    Cs = params[0]
    x = queries[0]
    out = list(multisequence(x, list(Cs)))
    V = Cs[0].shape[0]
    assert len(out) == V * V  # exhaustive traversal
    dists = [d for d, _ in out]
    assert all(dists[i] <= dists[i + 1] + 1e-9 for i in range(len(dists) - 1))
    # Distances must equal the exact per-split sums.
    halves = np.split(x, 2)
    d0 = ((halves[0][None] - Cs[0]) ** 2).sum(1)
    d1 = ((halves[1][None] - Cs[1]) ** 2).sum(1)
    for d, (c0, c1) in out[:50]:
        np.testing.assert_allclose(d, d0[c0] + d1[c1], rtol=1e-5)
    cells = {tuple(int(v) for v in c) for _, c in out}
    assert len(cells) == V * V


def test_searcher_adc_distances_match_oracle(setup):
    model, params, X, queries = setup
    searcher = LOPQSearcher(model)
    searcher.add_data(X[:200])
    q = queries[0]
    results, _ = searcher.search(q, quota=50, with_dists=True)
    assert len(results) > 0
    for res in results[:20]:
        want = adc_distance(q, res.code.coarse, res.code.fine, *params)
        np.testing.assert_allclose(res.dist, want, rtol=1e-3, atol=1e-4)
    # Results sorted ascending.
    d = [r.dist for r in results]
    assert d == sorted(d)


def test_searcher_dedup_and_count(setup):
    model, _, X, _ = setup
    searcher = LOPQSearcher(model)
    searcher.add_data(X[:100], ids=list(range(100)))
    assert searcher.get_nb_indexed() == 100
    # Re-adding the same ids must be a no-op (reference dedup semantics).
    searcher.add_data(X[:100], ids=list(range(100)))
    assert searcher.get_nb_indexed() == 100


def test_tpu_searcher_matches_parity_searcher(setup):
    model, _, X, queries = setup
    ids = [f"sha1_{i}" for i in range(len(X))]
    s_host = LOPQSearcher(model)
    s_host.add_data(X, ids=ids)
    s_tpu = LOPQSearcherTPU(model)
    s_tpu.add_data(X, ids=ids)
    assert s_tpu.get_cell((0, 0)) is not None

    for q in queries[:8]:
        quota = 200
        r_host, _ = s_host.search(q, quota=quota, limit=20, with_dists=True)
        r_tpu, _ = s_tpu.search(q, quota=quota, limit=20, with_dists=True)
        ids_h = [r.id for r in r_host]
        ids_t = [r.id for r in r_tpu]
        d_h = np.array([r.dist for r in r_host])
        d_t = np.array([r.dist for r in r_tpu])
        np.testing.assert_allclose(d_h, d_t, rtol=1e-3, atol=1e-4)
        # Allow order swaps only between (near-)equal distances.
        for i, (ih, it) in enumerate(zip(ids_h, ids_t)):
            if ih != it:
                assert abs(d_h[i] - d_t[i]) < 1e-3


def test_tpu_searcher_dedup(setup):
    model, _, X, _ = setup
    s = LOPQSearcherTPU(model)
    s.add_data(X[:50], ids=list(range(50)))
    s.add_data(X[:50], ids=list(range(50)))
    s.search(X[0], quota=10)  # force pack
    assert s.get_nb_indexed() == 50


def test_trained_model_recall():
    rng = np.random.RandomState(33)
    # Clustered data so LOPQ structure helps.
    centers = rng.randn(32, 16).astype(np.float32) * 3
    X = (centers[rng.randint(0, 32, 5000)]
         + 0.3 * rng.randn(5000, 16).astype(np.float32))
    queries = X[:50] + 0.01 * rng.randn(50, 16).astype(np.float32)

    model = LOPQModel(V=8, M=4, subquantizer_clusters=64)
    model.fit(X, kmeans_coarse_iters=8, kmeans_local_iters=8, n_init=2,
              random_state=0)

    nns = compute_all_neighbors(queries, X)
    searcher = LOPQSearcherTPU(model)
    searcher.add_data(X)
    recall, qtime = get_recall(searcher, queries, nns, thresholds=[1, 10, 100])
    assert recall[2] >= 0.95  # recall@100 with quota 100
    assert recall[1] >= 0.8
    assert recall[0] >= 0.5


def test_tpu_searcher_batched_matches_single(setup):
    model, _, X, queries = setup
    ids = [f"b_{i}" for i in range(len(X))]
    s = LOPQSearcherTPU(model)
    s.add_data(X, ids=ids)
    batch = s.search_batch(queries[:4], quota=200, limit=10, with_dists=True)
    assert len(batch) == 4
    for q, (res_b, vis_b) in zip(queries[:4], batch):
        res_s, vis_s = s.search(q, quota=200, limit=10, with_dists=True)
        assert [r.id for r in res_b] == [r.id for r in res_s]
        np.testing.assert_allclose([r.dist for r in res_b],
                                   [r.dist for r in res_s], rtol=1e-5)
        assert vis_b == vis_s


def test_dedup_first_mask_matches_reference_semantics():
    """Vectorized dedup == per-row first-insertion dedup (search.py:342-364)."""
    from columbiaimagesearch_tpu.utils.codes import dedup_first_mask

    rs = np.random.RandomState(7)
    n = 5000
    cells = rs.randint(0, 64, n).astype(np.int64)
    ids = np.empty(n, dtype=object)
    # mixed id types + heavy duplication
    ids[:] = [("s%d" % v) if v % 3 else v for v in rs.randint(0, n // 4, n)]
    keep = dedup_first_mask(cells, ids)
    seen = set()
    for i in range(n):
        key = (int(cells[i]), ids[i])
        expected = key not in seen
        seen.add(key)
        assert keep[i] == expected, i
    assert keep.sum() == len(seen)


def test_dedup_first_mask_empty_and_unique():
    from columbiaimagesearch_tpu.utils.codes import dedup_first_mask

    assert dedup_first_mask(np.zeros(0, np.int64), []).shape == (0,)
    m = dedup_first_mask(np.array([1, 2, 3]), ["a", "b", "a"])
    assert m.all()  # same id in different cells is NOT a duplicate


def test_tpu_searcher_incremental_dedup_across_refreshes():
    """(cell, id) duplicates arriving in LATER refreshes must be dropped
    (first insertion wins), and appends must not disturb earlier results."""
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    rs = np.random.RandomState(3)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(300, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)

    s = LOPQSearcherTPU(model)
    ids1 = [f"id{i}" for i in range(200)]
    s.add_codes((coarse[:200], fine[:200]), ids1)
    assert s.get_nb_indexed() == 200  # forces first pack

    # second refresh: 100 new + 50 exact duplicates of the first batch
    ids2 = [f"id{i}" for i in range(200, 300)] + ids1[:50]
    s.add_codes((np.concatenate([coarse[200:], coarse[:50]]),
                 np.concatenate([fine[200:], fine[:50]])), ids2)
    assert s.get_nb_indexed() == 300  # dups dropped

    # same id in a DIFFERENT cell is not a duplicate
    other = np.nonzero((coarse[:, 0] != coarse[0, 0])
                       | (coarse[:, 1] != coarse[0, 1]))[0][0]
    s.add_codes((coarse[other:other + 1], fine[other:other + 1]), ["id0"])
    assert s.get_nb_indexed() == 301

    # results after all refreshes match the host parity searcher fed the
    # same insertion sequence (ids resolve through the device order map)
    host = LOPQSearcher(model)
    host.add_codes((coarse[:200], fine[:200]), ids1)
    host.add_codes((np.concatenate([coarse[200:], coarse[:50]]),
                    np.concatenate([fine[200:], fine[:50]])), ids2)
    host.add_codes((coarse[other:other + 1], fine[other:other + 1]), ["id0"])
    assert host.get_nb_indexed() == 301
    for q in range(4):
        res, _ = s.search(X[q], quota=300, limit=5, with_dists=True)
        res_h, _ = host.search(X[q], quota=300, limit=5, with_dists=True)
        assert [r.id for r in res] == [r.id for r in res_h]
        np.testing.assert_allclose([r.dist for r in res],
                                   [r.dist for r in res_h], rtol=1e-4)


def test_dedup_handles_none_ids_and_sequence_ids():
    """Review regressions: bulk factorize path must not collapse None ids
    across cells; sequence-typed ids must materialize one per element."""
    from columbiaimagesearch_tpu.utils.codes import (
        IncrementalDedup,
        ids_to_object_array,
    )

    n = 150_000
    rs = np.random.RandomState(0)
    cells = rs.randint(0, 64, n).astype(np.int64)
    ids = np.empty(n, dtype=object)
    ids[:] = [f"s{i}" for i in range(n)]
    ids[:64] = None  # NaN-like ids in 64 different cells
    cells[:64] = np.arange(64)
    d = IncrementalDedup()
    keep = d.filter_new(cells, ids)
    # one None per distinct cell must survive (not collapse to one key)
    assert keep[:64].sum() == 64
    # a later refresh re-inserting an existing (cell, id) is dropped
    keep2 = d.filter_new(cells[64:66], ids[64:66])
    assert not keep2.any()

    arr = ids_to_object_array([(1, 2), (3, 4)], 2)
    assert arr.shape == (2,) and arr[0] == (1, 2)


def test_merge_refresh_matches_sort_path():
    """The linear-merge refresh (csr.merge_append_csr; default only above
    MERGE_REFRESH_MIN_CAP) must produce the same results as the re-sort
    path across several refreshes, including dedup and sentinel padding."""
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    rs = np.random.RandomState(9)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(3000, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = [f"m{i}" for i in range(len(X))]

    s_merge = LOPQSearcherTPU(model)
    s_merge.MERGE_REFRESH_MIN_CAP = 0  # force the merge path
    s_sort = LOPQSearcherTPU(model)
    chunks = [(0, 1000), (1000, 1400), (1400, 1401), (1401, 2600),
              (2600, 3000)]
    for a, b in chunks:
        for s in (s_merge, s_sort):
            s.add_codes((coarse[a:b], fine[a:b]), ids[a:b])
            assert s.get_nb_indexed() == b  # forces repack each round
    # re-insert duplicates across a refresh boundary: both must drop them
    for s in (s_merge, s_sort):
        s.add_codes((coarse[:50], fine[:50]), ids[:50])
        assert s.get_nb_indexed() == 3000

    for q in range(6):
        r_m, v_m = s_merge.search(X[q], quota=300, limit=10, with_dists=True)
        r_s, v_s = s_sort.search(X[q], quota=300, limit=10, with_dists=True)
        assert [r.id for r in r_m] == [r.id for r in r_s]
        np.testing.assert_allclose([r.dist for r in r_m],
                                   [r.dist for r in r_s], rtol=1e-6)
        assert v_m == v_s


def test_merge_refresh_across_capacity_rebuild():
    """Capacity growth rebuilds fresh buffers (sort path, stale sorted view
    discarded); merges before AND after the rebuild must stay correct."""
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcher, LOPQSearcherTPU

    rs = np.random.RandomState(12)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(20000, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ids = [f"c{i}" for i in range(len(X))]

    s = LOPQSearcherTPU(model)
    s.MERGE_REFRESH_MIN_CAP = 0  # force merges whenever incremental
    host = LOPQSearcher(model)
    # chunks chosen to cross the 16384 capacity quantum mid-sequence
    # (merge, merge, rebuild, merge)
    bounds = [0, 4000, 7000, 17000, 20000]
    for a, b in zip(bounds, bounds[1:]):
        s.add_codes((coarse[a:b], fine[a:b]), ids[a:b])
        assert s.get_nb_indexed() == b
        host.add_codes((coarse[a:b], fine[a:b]), ids[a:b])
    for q in range(4):
        r_d, _ = s.search(X[q], quota=500, limit=10, with_dists=True)
        r_h, _ = host.search(X[q], quota=500, limit=10, with_dists=True)
        assert [r.id for r in r_d] == [r.id for r in r_h]
        np.testing.assert_allclose([r.dist for r in r_d],
                                   [r.dist for r in r_h], rtol=1e-4)


def test_concurrent_refresh_and_search():
    """Readers keep getting consistent results while a writer refreshes the
    index (the API's background load_codes vs threaded serving)."""
    import threading

    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    rs = np.random.RandomState(5)
    model = LOPQModel(parameters=random_params(rs, V=8, M=4, S=16, D=32))
    X = rs.randn(2000, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)

    s = LOPQSearcherTPU(model)
    s.add_codes((coarse[:500], fine[:500]),
                [f"i{j}" for j in range(500)])
    assert s.get_nb_indexed() == 500

    errors = []
    done = threading.Event()

    def writer():
        try:
            for start in range(500, 2000, 100):
                s.add_codes(
                    (coarse[start:start + 100], fine[start:start + 100]),
                    [f"i{j}" for j in range(start, start + 100)])
                s.get_nb_indexed()  # force a repack mid-flight
        except Exception as inst:  # pragma: no cover
            errors.append(("writer", inst))
        finally:
            done.set()

    def reader():
        try:
            while not done.is_set():
                res, _ = s.search(X[3], quota=200, limit=10,
                                  with_dists=True)
                assert res, "no results mid-refresh"
                d = [r.dist for r in res]
                assert d == sorted(d)
                for r in res:
                    assert str(r.id).startswith("i")
        except Exception as inst:  # pragma: no cover
            errors.append(("reader", inst))

    threads = [threading.Thread(target=reader) for _ in range(3)]
    w = threading.Thread(target=writer)
    for t in threads:
        t.start()
    w.start()
    w.join(timeout=300)
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert s.get_nb_indexed() == 2000
