"""PCA training as one covariance matmul + eigendecomposition.

TPU-first replacement for the reference's per-point outer-product accumulation
loop (reference: lopq/lopq/model.py:242-287 ``train_pca``): the covariance
estimator there is ``sum_i outer(x_i, x_i) / (n-1) - outer(mu, mu)``, which we
compute as a single ``X^T X`` matmul on the MXU using the algebraically
identical centered form ``(Xc^T Xc + outer(mu, mu)) / (n-1)`` (better
conditioned in float32 than accumulating raw second moments).

The eigenvector column permutation balancing variance across the two coarse
halves (``eigenvalue_allocation(2, E)``) matches the reference exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.ops.eigen_alloc import eigenvalue_allocation


@jax.jit
def _pca_cov(X):
    n = X.shape[0]
    mu = jnp.mean(X, axis=0)
    Xc = X - mu[None, :]
    # Reference estimator: sum(outer(x,x))/(n-1) - outer(mu,mu)
    #                    = Xc^T Xc / (n-1) + outer(mu,mu)/(n-1)
    A = (
        jnp.dot(Xc.T, Xc, preferred_element_type=jnp.float32,
                precision="highest")
        + jnp.outer(mu, mu)
    ) / (n - 1)
    return mu, A


def train_pca(data, pca_dims: int = 256, pca_subsample: int | None = None):
    """Train PCA; returns (params dict, pca_dims) like the reference.

    params keys match the reference output (lopq/lopq/model.py:280-286):
    ``mu`` (mean), ``P`` (D x pca_dims projection), ``E`` (kept eigenvalues,
    ascending), ``A`` (covariance), ``c`` (sample count).
    """
    data = jnp.asarray(data, dtype=jnp.float32)
    if pca_subsample:
        data = data[: min(int(pca_subsample), data.shape[0]), :]
    count = data.shape[0]
    D = data.shape[1]
    pca_dims = min(pca_dims, D)

    mu, A = _pca_cov(data)
    # eigh returns ascending eigenvalues, like numpy (reference relies on it).
    E, P = jnp.linalg.eigh(A)
    E = np.asarray(E[-pca_dims:])
    P = np.asarray(P[:, -pca_dims:])

    # Balance variance across the two coarse halves.
    permuted_inds = eigenvalue_allocation(2, E)
    P = P[:, permuted_inds]

    params = {
        "mu": np.asarray(mu),
        "P": P,
        "E": E,
        "A": np.asarray(A),
        "c": count,
    }
    return params, pca_dims
