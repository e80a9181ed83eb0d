"""LOPQModel / LOPQModelPCA: code parity vs oracle, train quality, round-trips."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.index.model import LOPQCode, LOPQModel, LOPQModelPCA

from tests.oracle_lopq import (
    adc_distance,
    encode_point,
    random_params,
    reconstruct_point,
)


@pytest.fixture(scope="module")
def injected_model():
    rng = np.random.RandomState(7)
    params = random_params(rng, V=8, M=4, S=16, D=32)
    return LOPQModel(parameters=params), params, rng.randn(50, 32).astype(np.float32)


def test_predict_matches_oracle(injected_model):
    model, params, X = injected_model
    Cs, Rs, mus, subs = params
    coarse_b, fine_b = model.predict_batch(X)
    for i, x in enumerate(X):
        want_c, want_f = encode_point(x, Cs, Rs, mus, subs)
        code = model.predict(x)
        assert tuple(int(c) for c in code.coarse) == want_c
        assert tuple(int(f) for f in code.fine) == want_f
        assert tuple(int(c) for c in coarse_b[i]) == want_c
        assert tuple(int(f) for f in fine_b[i]) == want_f


def test_predict_dtypes(injected_model):
    model, _, X = injected_model
    code = model.predict(X[0])
    assert code.coarse[0].dtype == np.uint8  # V=8 <= 256
    assert code.fine[0].dtype == np.uint8    # S=16 <= 256
    assert isinstance(code, LOPQCode)


def test_project_and_reconstruct_match_oracle(injected_model):
    model, params, X = injected_model
    Cs, Rs, mus, subs = params
    for x in X[:10]:
        coarse, fine = encode_point(x, Cs, Rs, mus, subs)
        # project
        got = model.project(x, coarse)
        halves = np.split(x, 2)
        want = np.concatenate([
            Rs[s][coarse[s]] @ (halves[s] - Cs[s][coarse[s]] - mus[s][coarse[s]])
            for s in range(2)])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # reconstruct
        got_r = model.reconstruct((coarse, fine))
        want_r = reconstruct_point(coarse, fine, Cs, Rs, mus, subs)
        np.testing.assert_allclose(got_r, want_r, rtol=1e-4, atol=1e-5)


def test_reconstruct_batch_matches_scalar(injected_model):
    model, _, X = injected_model
    coarse, fine = model.predict_batch(X)
    batch = model.reconstruct_batch(coarse, fine)
    for i in range(0, len(X), 10):
        scalar = model.reconstruct((tuple(coarse[i]), tuple(fine[i])))
        np.testing.assert_allclose(batch[i], scalar, rtol=1e-4, atol=1e-5)


def test_subquantizer_distances_match_oracle(injected_model):
    model, params, X = injected_model
    Cs, Rs, mus, subs = params
    x = X[0]
    coarse, fine = encode_point(x, Cs, Rs, mus, subs)
    tables = model.get_subquantizer_distances(x, coarse)
    assert len(tables) == model.M
    want = adc_distance(x, coarse, fine, Cs, Rs, mus, subs)
    got = sum(tables[i][fine[i]] for i in range(model.M))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cell_id_roundtrip(injected_model):
    model, _, _ = injected_model
    for c0 in range(model.V):
        for c1 in range(model.V):
            cid = model.get_cell_id_for_coarse_codes((c0, c1))
            assert model.get_coarse_codes_for_cell_id(cid) == (c0, c1)


def test_fit_end_to_end_reduces_distortion():
    rng = np.random.RandomState(11)
    X = rng.randn(4000, 32).astype(np.float32)
    model = LOPQModel(V=4, M=4, subquantizer_clusters=32)
    model.fit(X, kmeans_coarse_iters=8, kmeans_local_iters=8, n_init=2,
              random_state=0)
    coarse, fine = model.predict_batch(X)
    recon = model.reconstruct_batch(coarse, fine)
    err = np.linalg.norm(X - recon, axis=1) ** 2
    base = np.linalg.norm(X - X.mean(0), axis=1) ** 2
    # Quantization must beat the trivial mean-codebook by a wide margin.
    assert err.mean() < 0.6 * base.mean()
    # Shapes of trained parameters.
    assert model.Cs[0].shape == (4, 16)
    assert model.Rs[0].shape == (4, 16, 16)
    assert model.mus[1].shape == (4, 16)
    assert len(model.subquantizers[0]) == 2
    assert model.subquantizers[0][0].shape == (32, 8)


def test_fit_reuses_existing_parameters():
    rng = np.random.RandomState(12)
    X = rng.randn(1000, 16).astype(np.float32)
    params = random_params(np.random.RandomState(1), V=4, M=4, S=8, D=16)
    model = LOPQModel(parameters=(params[0], None, None, None))
    model.fit(X, kmeans_coarse_iters=4, kmeans_local_iters=4, n_init=1,
              random_state=0)
    # Coarse codebooks must be untouched.
    np.testing.assert_array_equal(model.Cs[0], params[0][0])
    np.testing.assert_array_equal(model.Cs[1], params[0][1])
    assert model.Rs is not None and model.subquantizers is not None


def test_pca_model_fit_predict_and_renorm():
    rng = np.random.RandomState(13)
    X = (rng.randn(3000, 64) @ np.diag(np.linspace(4, 0.1, 64))).astype(np.float32)
    model = LOPQModelPCA(V=4, M=4, subquantizer_clusters=16, renorm=True)
    model.fit(X, pca_dims=16, kmeans_coarse_iters=4, kmeans_local_iters=4,
              n_init=1, random_state=0)
    assert model.pca_P.shape == (64, 16)
    pca = model.apply_PCA(X[:5])
    np.testing.assert_allclose(np.linalg.norm(pca, axis=1), 1.0, rtol=1e-4)
    code = model.predict(X[0])
    assert len(code.coarse) == 2 and len(code.fine) == 4
    with pytest.raises(ValueError):
        model.fit_pca(X)


def test_mat_npz_roundtrip(tmp_path, injected_model):
    model, _, X = injected_model
    for fmt in ("mat", "npz"):
        path = str(tmp_path / f"model.{fmt}")
        getattr(model, f"export_{fmt}")(path)
        loaded = getattr(LOPQModel, f"load_{fmt}")(path)
        assert loaded.V == model.V and loaded.M == model.M
        c1, f1 = model.predict_batch(X[:5])
        c2, f2 = loaded.predict_batch(X[:5])
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(f1, f2)


def test_proto_roundtrip(tmp_path, injected_model):
    model, _, X = injected_model
    path = str(tmp_path / "model.pb")
    model.export_proto(path)
    loaded = LOPQModel.load_proto(path)
    assert loaded.V == model.V and loaded.M == model.M
    assert loaded.subquantizer_clusters == model.subquantizer_clusters
    c1, f1 = model.predict_batch(X[:5])
    c2, f2 = loaded.predict_batch(X[:5])
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(f1, f2)
    # parameters survive the float32 wire format exactly
    np.testing.assert_array_equal(loaded.Cs[0], model.Cs[0])
    np.testing.assert_array_equal(loaded.Rs[1], model.Rs[1])
    np.testing.assert_array_equal(loaded.mus[0], model.mus[0])
    np.testing.assert_array_equal(loaded.subquantizers[1][0],
                                  model.subquantizers[1][0])


def test_fit_reproducible_with_seed():
    rng = np.random.RandomState(20)
    X = rng.randn(1500, 16).astype(np.float32)
    m1 = LOPQModel(V=4, M=4, subquantizer_clusters=16)
    m1.fit(X, kmeans_coarse_iters=4, kmeans_local_iters=4, n_init=2,
           random_state=7)
    m2 = LOPQModel(V=4, M=4, subquantizer_clusters=16)
    m2.fit(X, kmeans_coarse_iters=4, kmeans_local_iters=4, n_init=2,
           random_state=7)
    np.testing.assert_array_equal(m1.Cs[0], m2.Cs[0])
    np.testing.assert_array_equal(m1.Rs[1], m2.Rs[1])
    np.testing.assert_array_equal(m1.subquantizers[0][0],
                                  m2.subquantizers[0][0])
    c1, f1 = m1.predict_batch(X[:20])
    c2, f2 = m2.predict_batch(X[:20])
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(f1, f2)


def test_streaming_rotation_accumulators_match():
    from columbiaimagesearch_tpu.ops.rotations import (
        _accumulate_streaming,
        accumulate_covariance_estimators,
    )

    rng = np.random.RandomState(30)
    X = rng.randn(2000, 12).astype(np.float32)
    C = rng.randn(5, 12).astype(np.float32)
    A1, mu1, c1, a1, r1 = accumulate_covariance_estimators(X, C)
    A2, mu2, c2, a2, r2 = _accumulate_streaming(X, C, device_chunk=300)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
