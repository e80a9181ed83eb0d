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
