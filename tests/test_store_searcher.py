"""KVIndexer store + SearcherLOPQ orchestration end-to-end."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.extraction.featsio import normfeatB64encode
from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
from columbiaimagesearch_tpu.store import KVIndexer, MemoryStorer


def make_indexer(rng, n_imgs=600, dim=64, extr="sentibank_feat_full_image"):
    """Populate a KVIndexer like the extraction pipeline would."""
    kv = KVIndexer(path=":memory:")
    centers = rng.randn(24, dim).astype(np.float32) * 3
    feats = (centers[rng.randint(0, 24, n_imgs)]
             + 0.2 * rng.randn(n_imgs, dim).astype(np.float32))
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    sha1s = [f"{i:040X}" for i in range(n_imgs)]

    batch = kv.batch_update_size = 200
    for b in range(0, n_imgs, batch):
        rows = {}
        chunk = list(range(b, min(b + batch, n_imgs)))
        for i in chunk:
            rows[sha1s[i]] = {
                f"ext:{extr}": normfeatB64encode(feats[i].astype(np.float32)),
                f"ext:{extr}_processed": "1",
                "info:s3_url": f"http://imgs/{sha1s[i]}.jpg",
            }
        kv.push_dict_rows(rows, kv.table_sha1infos_name)
        update_id, _ = kv.get_next_update_id(extr_type=extr)
        kv.push_dict_rows(
            {update_id: {kv.get_col_listsha1s():
                         ",".join(sha1s[i] for i in chunk),
                         kv.get_col_upcreate(): "now"}},
            kv.table_updateinfos_name)
    return kv, feats, sha1s


def test_kvindexer_roundtrip_and_scan():
    rng = np.random.RandomState(0)
    kv, feats, sha1s = make_indexer(rng, n_imgs=50)
    rows = kv.get_rows_by_batch(sha1s[:5], kv.table_sha1infos_name)
    assert len(rows) == 5
    assert rows[0][1]["info:s3_url"].decode().startswith("http://imgs/")
    # scan updates
    batches = list(kv.get_updates_from_date("1970-01-01"))
    n_updates = sum(len(b) for b in batches)
    assert n_updates == 1
    # features decode with matching sample ids
    sids, fts = kv.get_features_from_sha1s(sha1s[:10],
                                           "sentibank_feat_full_image")
    assert sids == sha1s[:10]
    np.testing.assert_allclose(np.vstack(fts), feats[:10], rtol=1e-5)
    # missing extraction detection
    missing = kv.get_missing_extr_sha1s(sha1s[:5] + ["FFFF"],
                                        "sentibank_feat_full_image")
    assert missing == ["FFFF"]


def test_kvindexer_unprocessed_updates():
    rng = np.random.RandomState(1)
    kv, _, _ = make_indexer(rng, n_imgs=60, extr="e_feat_full_image")
    ups = [u for b in kv.get_unprocessed_updates_from_date(
        "1970-01-01", extr_type="e_feat_full_image") for u in b]
    assert len(ups) == 1
    kv.push_dict_rows({ups[0][0]: {kv.get_col_upproc(): "done"}},
                      kv.table_updateinfos_name)
    ups2 = [u for b in kv.get_unprocessed_updates_from_date(
        "1970-01-01", extr_type="e_feat_full_image") for u in b]
    assert not ups2


@pytest.fixture(scope="module")
def searcher_env():
    rng = np.random.RandomState(2)
    kv, feats, sha1s = make_indexer(rng)
    storer = MemoryStorer()
    searcher = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=600, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        indexer=kv, storer=storer, reranking=False)
    return searcher, kv, feats, sha1s, storer


def test_searcher_trains_and_indexes(searcher_env):
    searcher, kv, feats, sha1s, storer = searcher_env
    assert searcher.model is not None
    assert searcher.get_nb_indexed() == len(sha1s)
    # model + codes persisted
    assert storer.load(searcher.build_model_str()) is not None
    assert len(list(storer.list_prefix(searcher.build_model_str()
                                       + "_codes/"))) == 3


def test_search_from_feats_full_image(searcher_env):
    searcher, kv, feats, sha1s, _ = searcher_env
    q = feats[42]
    out = searcher.search_from_feats([(sha1s[42], None)], [q],
                                     {"max_returned": 10})
    assert out["NumberImages"] == 1
    entry = out["AllSimilarImages"][0]
    assert entry["QuerySha1"] == sha1s[42]
    block = entry["SimilarImages"]
    assert block["NumberImages"] >= 1
    assert len(block["ImageSha1s"]) == block["NumberImages"]
    assert block["CachedImageURLs"][0].startswith("http://imgs/")
    assert block["Distances"] == sorted(block["Distances"])


def test_search_reranking_fixes_ranking(searcher_env):
    searcher, kv, feats, sha1s, _ = searcher_env
    rng = np.random.RandomState(3)
    q = feats[123] + 0.001 * rng.randn(64).astype(np.float32)
    # Without rerank, quantization ties make top-1 arbitrary; with exact
    # rerank the true NN must win (reference rerank semantics).
    out = searcher.search_from_feats(
        [(sha1s[123], None)], [q],
        {"max_returned": 5, "reranking": True, "rerank_nb": 200})
    block = out["AllSimilarImages"][0]["SimilarImages"]
    assert block["ImageSha1s"][0] == sha1s[123]
    assert block["Distances"][0] < 0.01
    assert block["Distances"] == sorted(block["Distances"])


def test_search_near_dup_filter(searcher_env):
    searcher, kv, feats, sha1s, _ = searcher_env
    q = feats[7]
    out = searcher.search_from_feats(
        [(sha1s[7], None)], [q],
        {"max_returned": 50, "reranking": True, "rerank_nb": 300,
         "near_dup": True, "near_dup_th": 0.05})
    block = out["AllSimilarImages"][0]["SimilarImages"]
    assert all(d <= 0.05 for d in block["Distances"])
    assert sha1s[7] in block["ImageSha1s"]


def test_searcher_resume_from_storer(searcher_env):
    searcher, kv, feats, sha1s, storer = searcher_env
    # A new searcher over the same storer must reload model + codes without
    # re-training (checkpoint/resume semantics).
    s2 = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=600, nb_min_train=100, train_at_init=False,
        detector_type="full", featurizer_type="sentibank",
        indexer=kv, storer=storer)
    assert s2.model is not None
    assert s2.get_nb_indexed() == len(sha1s)
    q = feats[5]
    out = s2.search_from_feats([(sha1s[5], None)], [q],
                               {"max_returned": 3, "reranking": True,
                                "rerank_nb": 100})
    assert out["AllSimilarImages"][0]["SimilarImages"]["ImageSha1s"][0] \
        == sha1s[5]


def test_incremental_load_codes(searcher_env):
    searcher, kv, feats, sha1s, _ = searcher_env
    # Push a new update with new images and refresh.
    rng = np.random.RandomState(4)
    new_feats = feats[:5] + 0.001 * rng.randn(5, 64).astype(np.float32)
    new_sha1s = [f"NEW{i:037X}" for i in range(5)]
    rows = {}
    for i, s in enumerate(new_sha1s):
        rows[s] = {
            "ext:sentibank_feat_full_image":
                normfeatB64encode(new_feats[i].astype(np.float32)),
            "ext:sentibank_feat_full_image_processed": "1",
            "info:s3_url": f"http://imgs/{s}.jpg",
        }
    kv.push_dict_rows(rows, kv.table_sha1infos_name)
    update_id, _ = kv.get_next_update_id(
        extr_type="sentibank_feat_full_image")
    kv.push_dict_rows(
        {update_id: {kv.get_col_listsha1s(): ",".join(new_sha1s)}},
        kv.table_updateinfos_name)
    before = searcher.get_nb_indexed()
    added = searcher.load_codes()
    assert added == 5
    assert searcher.get_nb_indexed() == before + 5


def test_store_rerank_feats_e2e():
    """SearcherLOPQ(store_rerank_feats=True): load_codes harvests features
    from the indexer into the device rerank store, and reranking=True
    serves through the fused device path with exact distances (the
    reference release config semantics, conf_search_sbpycaffe_release
    .json:16, without the HBase refetch)."""
    rng = np.random.RandomState(5)
    kv, feats, sha1s = make_indexer(rng, n_imgs=400)
    searcher = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=400, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        input_type="image", skip_get_sim_info=True,
        indexer=kv, storer=MemoryStorer(), reranking=True, rerank_nb=50,
        store_rerank_feats=True)
    assert searcher.get_nb_indexed() == len(sha1s)
    assert searcher.searcher.has_rerank_feats

    # Query with an indexed feature: device rerank must put it first at
    # ~zero exact distance.
    qi = 123
    out = searcher.search_from_feats(
        [(sha1s[qi], None)], [feats[qi]], {"max_returned": 5})
    sims = out["AllSimilarImages"][0]["SimilarImages"]
    assert sims["ImageSha1s"][0] == sha1s[qi]
    assert sims["Distances"][0] < 1e-3
    # distances are exact L2 in index space (plain lopq: feature space)
    for sid, d in zip(sims["ImageSha1s"], sims["Distances"]):
        row = sha1s.index(sid)
        np.testing.assert_allclose(
            d, np.linalg.norm(feats[row] - feats[qi]), rtol=1e-3,
            atol=1e-4)


def test_cached_codes_update_keeps_rerank_store():
    """A later update served from storer-cached codes (no listsha1s
    column) must NOT silently drop the device rerank store when the
    features are still fetchable from the indexer (round-3 review
    finding: a single featureless add_codes_from_dict irreversibly
    disabled fused rerank for the whole index)."""
    rng = np.random.RandomState(6)
    kv, feats, sha1s = make_indexer(rng, n_imgs=400)
    storer = MemoryStorer()
    searcher = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=400, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        input_type="image", skip_get_sim_info=True,
        indexer=kv, storer=storer, reranking=True, rerank_nb=50,
        store_rerank_feats=True)
    assert searcher.searcher.has_rerank_feats
    n0 = searcher.get_nb_indexed()

    # Simulate an update row whose codes live in the storer cache but
    # whose listsha1s column is gone (the reference tolerates partial
    # update rows; cached codes are the recovery path).
    extra_sha1s = [f"{i:040X}" for i in range(400, 432)]
    extr = "sentibank_feat_full_image"
    new_feats = rng.randn(32, feats.shape[1]).astype(np.float32)
    new_feats /= np.linalg.norm(new_feats, axis=1, keepdims=True)
    rows = {}
    for i, s in enumerate(extra_sha1s):
        rows[s] = {f"ext:{extr}": normfeatB64encode(new_feats[i]),
                   f"ext:{extr}_processed": "1"}
    kv.push_dict_rows(rows, kv.table_sha1infos_name)
    update_id, _ = kv.get_next_update_id(extr_type=extr)
    co, fi = searcher.model.predict_batch(new_feats)
    codes = {s: (tuple(int(c) for c in co[i]), tuple(int(f) for f in fi[i]))
             for i, s in enumerate(extra_sha1s)}
    storer.save(searcher._codes_key(update_id), codes)
    kv.push_dict_rows({update_id: {kv.get_col_upcreate(): "now"}},
                      kv.table_updateinfos_name)

    added = searcher.load_codes()
    assert added == 32
    assert searcher.get_nb_indexed() == n0 + 32
    # feature store survived: features were recovered from the indexer
    assert searcher.searcher.has_rerank_feats


def test_unfetchable_features_fall_back_to_cached_codes():
    """An update whose features are no longer fetchable must still index
    its rows from the storer-cached codes instead of marking the update
    indexed with zero rows (round-3 review finding)."""
    rng = np.random.RandomState(7)
    kv, feats, sha1s = make_indexer(rng, n_imgs=400)
    storer = MemoryStorer()
    searcher = SearcherLOPQ(
        model_type="lopq", V=8, M=4, subquantizer_clusters=32,
        nb_train=400, nb_min_train=100, train_at_init=True,
        detector_type="full", featurizer_type="sentibank",
        input_type="image", skip_get_sim_info=True,
        indexer=kv, storer=storer, reranking=True, rerank_nb=50,
        store_rerank_feats=True)
    n0 = searcher.get_nb_indexed()

    # Update row WITH a sha1 list, but the sha1s have no stored features
    # (e.g. purged after codes were computed) — only cached codes exist.
    ghost_sha1s = [f"{i:040X}" for i in range(500, 516)]
    extr = "sentibank_feat_full_image"
    ghost_feats = rng.randn(16, feats.shape[1]).astype(np.float32)
    co, fi = searcher.model.predict_batch(ghost_feats)
    codes = {s: (tuple(int(c) for c in co[i]), tuple(int(f) for f in fi[i]))
             for i, s in enumerate(ghost_sha1s)}
    update_id, _ = kv.get_next_update_id(extr_type=extr)
    storer.save(searcher._codes_key(update_id), codes)
    kv.push_dict_rows(
        {update_id: {kv.get_col_listsha1s(): ",".join(ghost_sha1s),
                     kv.get_col_upcreate(): "now"}},
        kv.table_updateinfos_name)

    added = searcher.load_codes()
    assert added == 16  # rows recovered from the cache, not lost
    assert searcher.get_nb_indexed() == n0 + 16
    # queries still work (featureless add dropped the store; the search
    # path must have fallen back cleanly)
    out = searcher.search_from_feats(
        [(sha1s[3], None)], [feats[3]], {"max_returned": 3})
    assert out["AllSimilarImages"][0]["SimilarImages"]["ImageSha1s"]
