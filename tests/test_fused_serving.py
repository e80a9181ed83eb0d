"""Fused device serving path: image buffer -> forward -> (device) ->
normalize/PCA/query in one program, vs the host path that round-trips the
feature through numpy. Both must rank identically.

Covers: SentibankFeaturizer.featurize_buffers_device,
LOPQSearcherTPU.search_device_feats, tpu_query.fused_feat_query, and the
GenericSearcher junction that picks the fused route.
"""

import base64
import io

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from PIL import Image

    from columbiaimagesearch_tpu.index.model import LOPQModelPCA
    from columbiaimagesearch_tpu.models.sentibank import SentibankFeaturizer
    from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ

    rng = np.random.RandomState(0)
    # Small PCA'd model over sentibank's 4096-d features.
    train = rng.randn(400, 4096).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    model = LOPQModelPCA(V=8, M=4, subquantizer_clusters=16)
    model.fit(train, pca_dims=32, kmeans_coarse_iters=3,
              kmeans_local_iters=3, n_init=1, random_state=0)

    featurizer = SentibankFeaturizer()
    searcher = SearcherLOPQ(
        model=model, model_type="lopq_pca", V=8, M=4, pca_dims=32,
        skip_get_sim_info=True, detector_type="full",
        featurizer=featurizer, sim_limit=10)

    # Index random features plus the query image's own feature.
    img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=90)
    jpeg = b.getvalue()
    own, status = featurizer.featurize_buffers([jpeg])
    assert status[0] == 0
    own = own[0] / np.linalg.norm(own[0])

    X = rng.randn(300, 4096).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X = np.vstack([X, own[None, :]])
    co, fi = model.predict_batch(X)
    searcher.searcher.add_codes(
        (co, fi), ids=[f"sha{i}" for i in range(len(X))])
    assert searcher.get_nb_indexed() == len(X)
    return searcher, featurizer, jpeg, own


def test_fused_path_matches_host_path(setup):
    searcher, featurizer, jpeg, own = setup
    b64 = base64.b64encode(jpeg).decode()
    opts = {"max_returned": 10}

    out_dev = searcher.search_imageB64_list([b64], dict(opts))
    sims = out_dev["AllSimilarImages"][0]["SimilarImages"]
    ids_dev = sims["ImageSha1s"]
    dists_dev = sims["Distances"]
    assert ids_dev, "fused path returned no results"
    # NB: the image's own indexed feature need NOT rank first here — with
    # renorm=False the projected query norm is tiny and quantization noise
    # dominates; the contract under test is host/device path equivalence.

    # Host path: same feature through numpy normalize + host PCA.
    fts, status = featurizer.featurize_buffers([jpeg])
    assert status[0] == 0
    dets = [(ids_dev and "q0", None)]
    out_host = searcher.search_from_feats(
        [("q0", None)], [np.asarray(fts[0])], dict(opts))
    sims_h = out_host["AllSimilarImages"][0]["SimilarImages"]
    assert sims_h["ImageSha1s"] == ids_dev
    np.testing.assert_allclose(sims_h["Distances"], dists_dev,
                               rtol=1e-4, atol=1e-5)


def test_fused_path_disabled_under_reranking(setup):
    """reranking without a resident feature store needs host features;
    the fused route must fall back and still produce results."""
    searcher, featurizer, jpeg, own = setup
    b64 = base64.b64encode(jpeg).decode()
    out = searcher.search_imageB64_list(
        [b64], {"max_returned": 5, "reranking": True, "rerank_nb": 10})
    sims = out["AllSimilarImages"][0]["SimilarImages"]
    assert sims["ImageSha1s"]


def test_fused_path_with_device_rerank():
    """With the feature store resident, reranking stays ON the fused
    device route and the planted self-feature ranks first with (near-)
    zero exact distance — quantization noise can bury it in the ADC-only
    ranking, but the exact rerank must surface it."""
    from columbiaimagesearch_tpu.index.model import LOPQModelPCA
    from columbiaimagesearch_tpu.models.sentibank import SentibankFeaturizer
    from columbiaimagesearch_tpu.searcher.searcher_lopq import SearcherLOPQ
    from PIL import Image

    rng = np.random.RandomState(1)
    train = rng.randn(400, 4096).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    model = LOPQModelPCA(V=8, M=4, subquantizer_clusters=16, renorm=True)
    model.fit(train, pca_dims=32, kmeans_coarse_iters=3,
              kmeans_local_iters=3, n_init=1, random_state=0)

    featurizer = SentibankFeaturizer()
    searcher = SearcherLOPQ(
        model=model, model_type="lopq_pca", V=8, M=4, pca_dims=32,
        skip_get_sim_info=True, detector_type="full",
        featurizer=featurizer, sim_limit=10, reranking=True, rerank_nb=20)

    img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=90)
    jpeg = b.getvalue()
    own, status = featurizer.featurize_buffers([jpeg])
    assert status[0] == 0
    own = own[0] / np.linalg.norm(own[0])
    X = rng.randn(300, 4096).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X = np.vstack([X, own[None, :]])
    co, fi = model.predict_batch(X)
    searcher.searcher.add_codes(
        (co, fi), ids=[f"sha{i}" for i in range(len(X))],
        feats=model.apply_PCA(X))
    assert searcher.searcher.has_rerank_feats

    b64 = base64.b64encode(jpeg).decode()
    out = searcher.search_imageB64_list([b64], {"max_returned": 5})
    sims = out["AllSimilarImages"][0]["SimilarImages"]
    assert sims["ImageSha1s"][0] == f"sha{len(X) - 1}"
    assert sims["Distances"][0] < 1e-3


def test_search_device_feats_plain_lopq():
    """Fused path without PCA (pca_P=None): normalize-only, matches the
    host route."""
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU
    from tests.oracle_lopq import random_params

    rng = np.random.RandomState(3)
    model = LOPQModel(parameters=random_params(rng, V=8, M=4, S=16, D=32))
    X = rng.randn(500, 32).astype(np.float32)
    s = LOPQSearcherTPU(model)
    s.add_data(X, ids=[f"p{i}" for i in range(len(X))])
    raw = rng.randn(2, 32).astype(np.float32) * 3.0
    waves = s.search_device_feats(jnp.asarray(raw), quota=100, limit=8)
    for i, (results, visited) in enumerate(waves):
        host, _ = s.search(raw[i] / np.linalg.norm(raw[i]), quota=100,
                           limit=8, with_dists=True)
        assert [r.id for r in results] == [r.id for r in host]
        np.testing.assert_allclose(
            [r.dist for r in results], [r.dist for r in host], rtol=1e-4)


def test_search_device_feats_batch(setup):
    """Raw device features in, batched: matches per-feature host search."""
    import jax.numpy as jnp

    searcher, featurizer, jpeg, own = setup
    rng = np.random.RandomState(7)
    raw = rng.randn(3, 4096).astype(np.float32)
    waves = searcher.searcher.search_device_feats(
        jnp.asarray(raw), quota=100, limit=5)
    assert len(waves) == 3
    for i, (results, visited) in enumerate(waves):
        assert results and visited > 0
        normed = raw[i] / np.linalg.norm(raw[i])
        host, _ = searcher.searcher.search(
            normed, quota=100, limit=5, with_dists=True)
        assert [r.id for r in results] == [r.id for r in host]
        np.testing.assert_allclose(
            [r.dist for r in results], [r.dist for r in host],
            rtol=1e-4, atol=1e-5)


def test_featurize_buffers_device_pads_to_bucket(setup):
    """Coalesced waves arrive at arbitrary sizes; the device featurize
    must pad its pixel batch to the wave-bucket set BEFORE the fused
    preprocess+forward program so it compiles once per bucket, never once
    per observed size (each fresh compile costs 30-300 s through the dev
    relay, mid-request)."""
    from columbiaimagesearch_tpu.models import sentibank as sb

    searcher, featurizer, jpeg, own = setup
    seen = []
    orig = sb.sentibank_features_fused

    def spy(params, stack, mean, *, bf16):
        seen.append(int(stack.shape[0]))
        return orig(params, stack, mean, bf16=bf16)

    sb.sentibank_features_fused = spy
    try:
        feats, status = featurizer.featurize_buffers_device([jpeg] * 3)
    finally:
        sb.sentibank_features_fused = orig
    assert seen == [4]            # bucket of 4, not a batch-3 program
    assert feats.shape[0] == 3    # padding sliced back off
    assert list(status) == [0, 0, 0]
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(feats[1]),
                               rtol=1e-5, atol=1e-5)


def test_featurize_wave_matches_device_path(setup):
    """featurize_wave (the serving wave route: fused preprocess+forward,
    padded output) must produce the same features as featurize_buffers."""
    searcher, featurizer, jpeg, own = setup
    wave, n, status = featurizer.featurize_wave([jpeg] * 3)
    assert n == 3 and wave.shape[0] == 4 and list(status) == [0, 0, 0]
    host, hstatus = featurizer.featurize_buffers([jpeg])
    np.testing.assert_allclose(np.asarray(wave[0]), host[0],
                               rtol=1e-4, atol=1e-4)


def test_serve_batch_wave_route_matches_sequential(setup):
    """_serve_batch's wave route (whole padded forward output -> one query
    wave, zero per-row slicing) must return exactly what per-request
    sequential serving returns."""
    searcher, featurizer, jpeg, own = setup
    b64 = base64.b64encode(jpeg).decode()
    opts = {"max_returned": 5}
    from columbiaimagesearch_tpu.imgio.imgio import get_buffer_from_B64

    seq = searcher.search_imageB64_list([b64], dict(opts))
    reqs = [searcher._prepare_request([b64], get_buffer_from_B64,
                                      dict(opts), False)
            for _ in range(3)]
    outs = searcher._serve_batch(reqs)
    for out in outs:
        assert not isinstance(out, Exception), out
        a = out["AllSimilarImages"][0]["SimilarImages"]
        b = seq["AllSimilarImages"][0]["SimilarImages"]
        assert a["ImageSha1s"] == b["ImageSha1s"]
        np.testing.assert_allclose(a["Distances"], b["Distances"],
                                   rtol=1e-4, atol=1e-5)


def test_prewarm_serving_compiles_buckets(setup):
    """prewarm_serving drives the exact coalesced serve route for every
    wave bucket and leaves the searcher fully functional."""
    searcher, featurizer, jpeg, own = setup
    warmed = searcher.prewarm_serving(4)
    assert warmed == [1, 2, 4]
    b64 = base64.b64encode(jpeg).decode()
    out = searcher.search_imageB64_list([b64], {"max_returned": 5})
    assert out["AllSimilarImages"][0]["SimilarImages"]["ImageSha1s"]
