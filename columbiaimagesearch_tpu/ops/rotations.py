"""Per-cluster covariance accumulation and local rotation fitting.

TPU-first replacement for the reference's per-point Python loop
(reference: lopq/lopq/model.py:109-206 ``accumulate_covariance_estimators`` /
``compute_rotations_from_accumulators``):

- cluster assignment is one chunked matmul (MXU),
- covariance accumulators are a ``segment_sum`` scatter of residual outer
  products (small D) or V masked matmuls (large D / small V),
- eigendecompositions run as one batched ``eigh`` over all V clusters,
- the eigenvector permutation balancing variance across subquantizer buckets
  is the vectorized ``eigenvalue_allocation_batch`` (one D-step loop for all
  clusters at once).

The estimator, the count<D identity fallback, and the row-permuted-transpose
layout of the rotation matrices (``R[v] = eigvecs[:, perm].T``, so rotations
apply as ``R @ r``) all match the reference semantics exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.ops.eigen_alloc import eigenvalue_allocation_batch
from columbiaimagesearch_tpu.ops.kmeans import _assign_chunked, _pick_chunk
from columbiaimagesearch_tpu.utils.chunking import pad_rows

# Below this cluster count the masked-matmul formulation (O(V*N*D^2) MXU
# flops, no scatter) beats segment_sum scatters of [chunk, D, D] outers.
_MASKED_MATMUL_MAX_V = 32


@functools.partial(jax.jit, static_argnames=("V", "chunk"))
def _accumulate_segment(R, w, assign, V: int, chunk: int):
    """Covariance accumulators via segment_sum of residual outer products."""
    N, D = R.shape

    def body(i, acc):
        A, mu, cnt = acc
        r = jax.lax.dynamic_slice_in_dim(R, i * chunk, chunk, 0)
        a = jax.lax.dynamic_slice_in_dim(assign, i * chunk, chunk, 0)
        ww = jax.lax.dynamic_slice_in_dim(w, i * chunk, chunk, 0)
        rw = r * ww[:, None]
        outer = jnp.einsum("nd,ne->nde", rw, r)
        A = A + jax.ops.segment_sum(outer, a, num_segments=V)
        mu = mu + jax.ops.segment_sum(rw, a, num_segments=V)
        cnt = cnt + jax.ops.segment_sum(ww, a, num_segments=V)
        return A, mu, cnt

    init = (
        jnp.zeros((V, D, D), dtype=jnp.float32),
        jnp.zeros((V, D), dtype=jnp.float32),
        jnp.zeros((V,), dtype=jnp.float32),
    )
    return jax.lax.fori_loop(0, N // chunk, body, init)


@functools.partial(jax.jit, static_argnames=("V",))
def _accumulate_masked(R, w, assign, V: int):
    """Covariance accumulators via V masked matmuls (MXU-heavy, scatter-free)."""
    N, D = R.shape
    onehot = (assign[:, None] == jnp.arange(V)[None, :]).astype(jnp.float32)
    onehot = onehot * w[:, None]  # [N, V]

    def per_cluster(ohv):
        rw = R * ohv[:, None]
        return jnp.dot(rw.T, R, preferred_element_type=jnp.float32,
                       precision="highest")

    A = jax.lax.map(per_cluster, onehot.T)  # [V, D, D]
    mu = jnp.dot(onehot.T, R, preferred_element_type=jnp.float32,
                 precision="highest")  # [V, D]
    cnt = jnp.sum(onehot, axis=0)
    return A, mu, cnt


# Above this many elements, stream host-resident data through the device in
# chunks instead of materializing it in HBM (matches ops.kmeans threshold).
STREAMING_THRESHOLD_ELEMENTS = 1 << 29


def accumulate_covariance_estimators(data, C):
    """Single pass: per-cluster residual outer-product sums.

    Same contract as the reference (lopq/lopq/model.py:109-157):
    returns (A [V,D,D] outer-product sums, mu [V,D] residual sums,
    count [V], assignments [N] int32, residuals [N,D]).

    Data larger than the HBM budget streams from the host chunk-by-chunk;
    only the [V,D,D] accumulators live on device across chunks.
    """
    if np.asarray(data).size > STREAMING_THRESHOLD_ELEMENTS:
        return _accumulate_streaming(np.asarray(data, dtype=np.float32),
                                     np.asarray(C, dtype=np.float32))
    data = jnp.asarray(data, dtype=jnp.float32)
    C = jnp.asarray(C, dtype=jnp.float32)
    V, D = C.shape
    N = data.shape[0]

    chunk = _pick_chunk(N)
    Xp, n = pad_rows(data, chunk)
    w = jnp.zeros(Xp.shape[0], dtype=jnp.float32).at[:n].set(1.0)
    assign, _ = _assign_chunked(Xp, C, chunk)
    residuals = Xp - C[assign]

    if V <= _MASKED_MATMUL_MAX_V:
        A, mu, cnt = _accumulate_masked(residuals, w, assign, V)
    else:
        # Bound the [oc, D, D] outer-product buffer to ~128 MB.
        oc = max(256, min(chunk, (1 << 25) // max(D * D, 1)))
        Rp, _ = pad_rows(residuals, oc)
        wp, _ = pad_rows(w, oc)
        ap, _ = pad_rows(assign, oc)
        A, mu, cnt = _accumulate_segment(Rp, wp, ap, V, oc)

    return A, mu, cnt, assign[:n], residuals[:n]


def _accumulate_streaming(data, C, device_chunk: int = 131072):
    """Host-chunked accumulation for beyond-HBM training sets."""
    from columbiaimagesearch_tpu.ops.kmeans import assign_clusters

    V, D = C.shape
    N = len(data)
    Cd = jnp.asarray(C)
    A = jnp.zeros((V, D, D), dtype=jnp.float32)
    mu = jnp.zeros((V, D), dtype=jnp.float32)
    cnt = jnp.zeros((V,), dtype=jnp.float32)
    assignments = np.zeros(N, dtype=np.int32)
    residuals = np.zeros((N, D), dtype=np.float32)
    oc = max(256, min(device_chunk, (1 << 25) // max(D * D, 1)))
    for start in range(0, N, device_chunk):
        chunk = data[start:start + device_chunk]
        a, _ = assign_clusters(chunk, Cd)
        a = jnp.asarray(a, dtype=jnp.int32)
        r = jnp.asarray(chunk) - Cd[a]
        n = len(chunk)
        w = jnp.ones(n, dtype=jnp.float32)
        if V <= _MASKED_MATMUL_MAX_V:
            dA, dmu, dcnt = _accumulate_masked(r, w, a, V)
        else:
            rp, _ = pad_rows(r, oc)
            wp, _ = pad_rows(w, oc)
            ap, _ = pad_rows(a, oc)
            dA, dmu, dcnt = _accumulate_segment(rp, wp, ap, V, oc)
        A = A + dA
        mu = mu + dmu
        cnt = cnt + dcnt
        assignments[start:start + n] = np.asarray(a)
        residuals[start:start + n] = np.asarray(r)
    return A, mu, cnt, assignments, residuals


def compute_rotations_from_accumulators(A, mu, count, num_buckets: int):
    """Batched rotation fitting from accumulators.

    Matches the reference per-cluster loop (lopq/lopq/model.py:160-206):
    cov = (A + A^T) / (2 (n-1)) - outer(mu, mu); identity fallback when a
    cluster has fewer points than dimensions; eigenvector permutation by
    balanced eigenvalue allocation; rotations stored row-major so they apply
    as ``R @ r``.

    :returns: (R [V,D,D] float32 rotations, mu [V,D] mean residuals)
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    mu = jnp.asarray(mu, dtype=jnp.float32)
    count = jnp.asarray(count, dtype=jnp.float32)
    V, D = mu.shape

    mu = mu / jnp.maximum(count, 1.0)[:, None]
    denom = jnp.maximum(2.0 * (count - 1.0), 1.0)[:, None, None]
    cov = (A + jnp.swapaxes(A, 1, 2)) / denom - jnp.einsum("vd,ve->vde", mu, mu)

    eigvals, eigvecs = jnp.linalg.eigh(cov)  # batched over V

    # Identity fallback for underpopulated clusters (reference lines 196-198).
    degenerate = count < D  # [V]
    eye = jnp.eye(D, dtype=jnp.float32)
    eigvals = jnp.where(degenerate[:, None], jnp.ones((V, D)), eigvals)
    eigvecs = jnp.where(degenerate[:, None, None], eye[None], eigvecs)

    # Balanced allocation runs host-side (tiny sequential greedy), vectorized
    # across all V clusters.
    perms = eigenvalue_allocation_batch(num_buckets, np.asarray(eigvals))
    eigvecs = np.asarray(eigvecs)
    # R[v] = eigvecs[v][:, perm[v]].T  (reference: A[i] = A[i, :, permuted_inds])
    R = np.take_along_axis(eigvecs, perms[:, None, :], axis=2).transpose(0, 2, 1)
    return jnp.asarray(R), mu


def compute_local_rotations(data, C, num_buckets: int):
    """Fit per-cluster rotations (reference: lopq/lopq/model.py:74-106).

    :returns: (R [V,D,D], mu [V,D], assignments [N], residuals [N,D])
    """
    A, mu_sum, count, assignments, residuals = accumulate_covariance_estimators(data, C)
    R, mu = compute_rotations_from_accumulators(A, mu_sum, count, num_buckets)
    return R, mu, assignments, residuals


@functools.partial(jax.jit, static_argnames=("V",))
def _project_masked(residuals, assign, Rs, mus, V: int):
    out = jnp.zeros_like(residuals)
    for v in range(V):  # static unroll: V matmuls on the MXU
        shifted = residuals - mus[v][None, :]
        proj = jnp.dot(shifted, Rs[v].T, preferred_element_type=jnp.float32,
                       precision="highest")
        out = jnp.where((assign == v)[:, None], proj, out)
    return out


@functools.partial(jax.jit, static_argnames=("chunk",))
def _project_gather(residuals, assign, Rs, mus, chunk: int):
    N, D = residuals.shape

    def one_chunk(args):
        r, a = args
        Rg = Rs[a]  # [chunk, D, D] gathered rotations
        shifted = r - mus[a]
        return jnp.einsum("nij,nj->ni", Rg, shifted, precision="highest")

    rc = residuals.reshape(N // chunk, chunk, D)
    ac = assign.reshape(N // chunk, chunk)
    out = jax.lax.map(one_chunk, (rc, ac))
    return out.reshape(N, D)


def project_residuals_to_local(residuals, assignments, Rs, mus):
    """Batched local-frame projection: ``out[n] = R[a[n]] @ (r[n] - mu[a[n]])``.

    Reference semantics: lopq/lopq/model.py:209-234 (per-point Python loop).
    Beyond-HBM inputs stream from the host in slabs.
    """
    res_np = np.asarray(residuals)
    if res_np.size > STREAMING_THRESHOLD_ELEMENTS:
        out = np.zeros_like(res_np, dtype=np.float32)
        slab = 131072
        a_np = np.asarray(assignments)
        for start in range(0, len(res_np), slab):
            out[start:start + slab] = np.asarray(project_residuals_to_local(
                res_np[start:start + slab], a_np[start:start + slab],
                Rs, mus))
        return out
    residuals = jnp.asarray(residuals, dtype=jnp.float32)
    assignments = jnp.asarray(assignments, dtype=jnp.int32)
    Rs = jnp.asarray(Rs, dtype=jnp.float32)
    mus = jnp.asarray(mus, dtype=jnp.float32)
    V, D = mus.shape

    if V <= _MASKED_MATMUL_MAX_V:
        return _project_masked(residuals, assignments, Rs, mus, V)

    # Bound the gathered-rotations buffer [chunk, D, D] to ~128 MB.
    chunk = max(256, min(4096, (1 << 25) // max(D * D, 1)))
    rp, n = pad_rows(residuals, chunk)
    ap, _ = pad_rows(assignments, chunk)
    out = _project_gather(rp, ap, Rs, mus, chunk)
    return out[:n]


def compute_residuals(data, C):
    """Residuals to nearest centroid (reference: lopq/lopq/model.py:237-240)."""
    from columbiaimagesearch_tpu.ops.kmeans import assign_clusters

    data = jnp.asarray(data, dtype=jnp.float32)
    C = jnp.asarray(C, dtype=jnp.float32)
    assignments, _ = assign_clusters(data, C)
    residuals = data - C[assignments]
    return residuals, assignments
