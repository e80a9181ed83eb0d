"""k-means and PCA training-op quality/parity tests."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.ops.kmeans import assign_clusters, fit_kmeans, lloyd_kmeans
from columbiaimagesearch_tpu.ops.pca import train_pca


def blobs(rng, n_per, centers, d, scale=0.05):
    C = rng.randn(centers, d).astype(np.float32) * 2.0
    X = np.concatenate(
        [C[i] + scale * rng.randn(n_per, d).astype(np.float32)
         for i in range(centers)])
    rng.shuffle(X)
    return X, C


def test_assign_clusters_matches_numpy():
    rng = np.random.RandomState(0)
    X = rng.randn(500, 16).astype(np.float32)
    C = rng.randn(7, 16).astype(np.float32)
    a, d = assign_clusters(X, C)
    full = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(a), full.argmin(1))
    np.testing.assert_allclose(np.asarray(d), full.min(1), rtol=2e-4, atol=2e-4)


def test_kmeans_recovers_separated_blobs():
    rng = np.random.RandomState(1)
    X, true_C = blobs(rng, 200, 8, 16)
    C = np.asarray(fit_kmeans(X, 8, iters=20, n_init=3, seed=0))
    # Every true center must be near some learned center.
    d = ((true_C[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    assert np.sqrt(d.min(axis=1)).max() < 0.1


def test_kmeans_inertia_not_worse_than_sklearn():
    sklearn = pytest.importorskip("sklearn.cluster")
    rng = np.random.RandomState(2)
    X = rng.randn(3000, 32).astype(np.float32)
    C_ours = np.asarray(fit_kmeans(X, 16, iters=20, n_init=3, seed=0))
    _, d_ours = assign_clusters(X, C_ours)
    skm = sklearn.MiniBatchKMeans(
        n_clusters=16, init="k-means++", max_iter=20, n_init=3,
        batch_size=10000, random_state=0).fit(X)
    _, d_sk = assign_clusters(X, skm.cluster_centers_.astype(np.float32))
    # Full-batch Lloyd should match or beat the mini-batch heuristic.
    assert float(np.sum(np.asarray(d_ours))) <= 1.02 * float(np.sum(np.asarray(d_sk)))


def test_lloyd_handles_nonmultiple_chunk_sizes():
    rng = np.random.RandomState(3)
    X = rng.randn(1037, 8).astype(np.float32)  # deliberately awkward N
    C0 = X[:5].copy()
    C, a, inertia = lloyd_kmeans(X, C0, iters=5)
    assert np.asarray(C).shape == (5, 8)
    assert np.asarray(a).shape == (1037,)
    assert inertia > 0


def test_train_pca_matches_numpy_reference_estimator():
    rng = np.random.RandomState(4)
    X = (rng.randn(2000, 32) @ np.diag(np.linspace(3, 0.1, 32))).astype(np.float32)
    params, dims = train_pca(X, pca_dims=8)
    assert dims == 8
    # Oracle: the reference's biased estimator sum(outer)/ (n-1) - outer(mu,mu).
    mu = X.mean(axis=0)
    A = (X.astype(np.float64).T @ X.astype(np.float64)) / (len(X) - 1) - np.outer(mu, mu)
    np.testing.assert_allclose(params["mu"], mu, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(params["A"], A, rtol=2e-2, atol=2e-3)
    # Projection must capture the top-8 eigenspace: the subspace projector
    # of our P must match the numpy eigh projector.
    E, P = np.linalg.eigh(A)
    P_top = P[:, -8:]
    proj_ours = params["P"] @ params["P"].T
    proj_np = P_top @ P_top.T
    np.testing.assert_allclose(proj_ours, proj_np, atol=5e-3)


def test_train_pca_column_permutation_balances_halves():
    rng = np.random.RandomState(5)
    X = (rng.randn(3000, 16) @ np.diag(np.linspace(5, 0.5, 16))).astype(np.float32)
    params, _ = train_pca(X, pca_dims=8)
    Y = (X - params["mu"]) @ params["P"]
    var = Y.var(axis=0)
    v1, v2 = var[:4].prod(), var[4:].prod()
    # Balanced allocation: log-products of the two halves should be close.
    assert abs(np.log(v1) - np.log(v2)) < np.log(np.max(var) / np.min(var)) + 1e-6


def test_streaming_lloyd_matches_on_device():
    from columbiaimagesearch_tpu.ops.kmeans import (
        fit_kmeans,
        fit_kmeans_streaming,
        kmeans_plusplus_init,
    )

    rng = np.random.RandomState(6)
    X = rng.randn(3000, 24).astype(np.float32)
    # Same seed -> identical kmeans++ init on the (full-coverage) subsample,
    # and streaming accumulates full-batch updates -> identical Lloyd math.
    C_full = np.asarray(fit_kmeans(X, 8, iters=6, n_init=1, seed=3))
    C_stream = np.asarray(fit_kmeans_streaming(
        X, 8, iters=6, n_init=1, seed=3, device_chunk=700,
        init_subsample=3000))
    np.testing.assert_allclose(np.sort(C_full, axis=0),
                               np.sort(C_stream, axis=0), rtol=1e-3,
                               atol=1e-3)
    # And quality is equivalent.
    _, d_f = assign_clusters(X, C_full)
    _, d_s = assign_clusters(X, C_stream)
    assert abs(float(np.sum(np.asarray(d_f))) - float(np.sum(np.asarray(d_s)))) \
        < 0.02 * float(np.sum(np.asarray(d_f)))
