"""Exhaustive ADC Pallas kernel (interpret mode on CPU) vs the oracle."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQModel
from columbiaimagesearch_tpu.index.pallas_adc import (
    BLK,
    ExhaustiveADC,
    build_padded_layout,
)
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher

from tests.oracle_lopq import adc_distance, random_params


def test_padded_layout():
    rng = np.random.RandomState(0)
    cells = rng.randint(0, 9, 1000)
    fine = rng.randint(0, 256, (1000, 8), dtype=np.uint8)
    codes_padded, block_cell, block_count, row_of = build_padded_layout(
        cells, fine)
    assert len(codes_padded) % BLK == 0
    assert block_count.sum() == 1000
    # every row lands in a block of its own cell, codes preserved
    for i in rng.choice(1000, 50, replace=False):
        pos = row_of[i]
        assert block_cell[pos // BLK] == cells[i]
        np.testing.assert_array_equal(codes_padded[pos], fine[i])
    # padding rows are zero + not counted
    for b in range(len(block_cell)):
        assert block_count[b] <= BLK


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(1)
    params = random_params(rng, V=8, M=4, S=16, D=32)
    model = LOPQModel(parameters=params)
    X = rng.randn(3000, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)
    ex = ExhaustiveADC(model, interpret=True)  # CPU: interpreter mode
    ex.build(coarse, fine, ids=[f"v{i}" for i in range(len(X))])
    return model, params, X, coarse, fine, ex


def test_exhaustive_matches_oracle_distances(built):
    model, params, X, coarse, fine, ex = built
    rng = np.random.RandomState(2)
    q = rng.randn(32).astype(np.float32)
    ids, dists = ex.search(q, k=20)
    assert len(ids) == 20
    # Every returned distance equals the oracle ADC distance of that item.
    for rid, d in zip(ids[:10], dists[:10]):
        i = int(rid[1:])
        want = adc_distance(q, coarse[i], fine[i], *params)
        np.testing.assert_allclose(d, want, rtol=1e-3, atol=1e-3)
    assert list(dists) == sorted(dists)


def test_exhaustive_beats_probed_recall(built):
    model, params, X, coarse, fine, ex = built
    # Exhaustive top-1 by ADC == global minimum over ALL items — verify
    # against a brute-force ADC computed via the host searcher with full
    # quota.
    host = LOPQSearcher(model)
    host.add_codes((coarse, fine), [f"v{i}" for i in range(len(X))])
    rng = np.random.RandomState(3)
    for q in rng.randn(5, 32).astype(np.float32):
        ids, dists = ex.search(q, k=5)
        ref, _ = host.search(q, quota=len(X), limit=5, with_dists=True)
        assert ids[0] == ref[0].id
        np.testing.assert_allclose(dists[0], ref[0].dist, rtol=1e-3)


def test_exact_searcher_backend():
    import jax

    from columbiaimagesearch_tpu.index.pallas_adc import ExhaustiveADCSearcher
    from columbiaimagesearch_tpu.index.model import LOPQModel

    rng = np.random.RandomState(5)
    params = random_params(rng, V=8, M=4, S=16, D=32)
    model = LOPQModel(parameters=params)
    X = rng.randn(800, 32).astype(np.float32)
    coarse, fine = model.predict_batch(X)

    s = ExhaustiveADCSearcher(model, interpret=True)
    s.add_codes_from_dict({f"v{i}": (tuple(coarse[i]), tuple(fine[i]))
                           for i in range(len(X))})
    assert s.get_nb_indexed() == 800
    res, visited = s.search(X[3], quota=5, with_dists=True)
    assert visited == model.V ** 2
    # exact global ADC minimum vs host full-quota search
    host = LOPQSearcher(model)
    host.add_codes((coarse, fine), [f"v{i}" for i in range(len(X))])
    ref, _ = host.search(X[3], quota=800, limit=5, with_dists=True)
    assert res[0].id == ref[0].id
    np.testing.assert_allclose(res[0].dist, ref[0].dist, rtol=1e-3)


def test_searcher_lopq_exact_backend_on_cpu():
    """SearcherLOPQ(exact=True) auto-selects interpreter mode off-TPU."""
    from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
    from columbiaimagesearch_tpu.store import MemoryStorer

    from tests.test_store_searcher import make_indexer

    rng = np.random.RandomState(9)
    kv, feats, sha1s = make_indexer(rng, n_imgs=300)
    searcher = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=300, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        indexer=kv, storer=MemoryStorer(), exact=True)
    assert searcher.get_nb_indexed() == 300
    out = searcher.search_from_feats([(sha1s[3], None)], [feats[3]],
                                     {"max_returned": 3, "reranking": False})
    block = out["AllSimilarImages"][0]["SimilarImages"]
    assert sha1s[3] in block["ImageSha1s"]
