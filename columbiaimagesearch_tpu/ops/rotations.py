"""Per-cluster covariance accumulation and local rotation fitting.

TPU-first replacement for the reference's per-point Python loop
(reference: lopq/lopq/model.py:109-206 ``accumulate_covariance_estimators`` /
``compute_rotations_from_accumulators``):

- cluster assignment is one chunked matmul (MXU),
- covariance accumulators are V masked matmuls (small V) or cluster-blocked
  batched matmuls over a sorted block-padded layout (large V) — both
  scatter-light and MXU-heavy,
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


# Cluster-blocked layout (the index/tpu_encode_blocked.py pattern): sort
# rows by cluster, pad every cluster's run to a BLK multiple, so the
# per-cluster work becomes NB ~ N/BLK batched block matmuls with ONE
# rotation/accumulator row per block. This replaces both scatter-heavy
# paths at large V: segment_sum of per-point [D, D] outer products
# (~16 GB of scattered elements at 1M x V=4096) and the per-point
# rotation gather in projection (~65 GB of gathered rotation rows) —
# measured 79 s and 124 s respectively at the 1M training bench; blocked
# they are batched MXU matmuls plus a [NB, D, D] segment_sum/gather.
_BLK = 128


def _blocked_layout(assign, V: int, n_blocks: int):
    """Sorted cluster-blocked layout: (order, a_sorted, ppos, bcluster).

    ``ppos[i]`` is the padded-buffer slot of sorted row i; ``bcluster[b]``
    the cluster owning block b (padding blocks carry zero rows).
    """
    N = assign.shape[0]
    order = jnp.argsort(assign, stable=True)
    a_sorted = assign[order]
    counts = jax.ops.segment_sum(jnp.ones(N, jnp.int32), assign,
                                 num_segments=V)
    padded = ((counts + _BLK - 1) // _BLK) * _BLK
    pstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(padded).astype(jnp.int32)])
    cstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.arange(N, dtype=jnp.int32) - cstart[a_sorted]
    ppos = pstart[a_sorted] + rank
    bidx = jnp.arange(n_blocks, dtype=jnp.int32) * _BLK
    bcluster = jnp.clip(
        jnp.searchsorted(pstart[1:], bidx, side="right"), 0, V - 1)
    return order, a_sorted, ppos, bcluster


def _blocks_for(n: int, V: int) -> int:
    """Static block count covering n rows with worst-case cluster padding."""
    return -(-n // _BLK) + V


@functools.partial(jax.jit, static_argnames=("V", "n_blocks"))
def _accumulate_blocked(R, w, assign, V: int, n_blocks: int):
    """Covariance accumulators via cluster-blocked batched matmuls."""
    N, D = R.shape
    order, a_sorted, ppos, bcluster = _blocked_layout(assign, V, n_blocks)
    rows = R[order] * w[order][:, None]       # zeroed invalid rows
    xp = jnp.zeros((n_blocks * _BLK, D), R.dtype).at[ppos].set(rows)
    xb = xp.reshape(n_blocks, _BLK, D)
    A_blocks = jax.lax.dot_general(
        xb, xb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [NB, D, D]
    A = jax.ops.segment_sum(A_blocks, bcluster, num_segments=V)
    mu = jax.ops.segment_sum(jnp.sum(xb, axis=1), bcluster, num_segments=V)
    cnt = jax.ops.segment_sum(w, assign, num_segments=V)
    return A, mu, cnt


@functools.partial(jax.jit, static_argnames=("V", "n_blocks"))
def _project_blocked(residuals, assign, Rs, mus, V: int, n_blocks: int):
    """Local-frame projection via one rotation row per block."""
    N, D = residuals.shape
    order, a_sorted, ppos, bcluster = _blocked_layout(assign, V, n_blocks)
    shifted = residuals[order] - mus[a_sorted]
    xp = jnp.zeros((n_blocks * _BLK, D), residuals.dtype).at[ppos].set(shifted)
    xb = xp.reshape(n_blocks, _BLK, D)
    Rb = Rs[bcluster]                         # [NB, D, D] one gather/block
    pb = jax.lax.dot_general(
        xb, Rb, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [NB, BLK, D]
    proj_sorted = pb.reshape(-1, D)[ppos]
    return jnp.zeros_like(proj_sorted).at[order].set(proj_sorted)


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
        A, mu, cnt = _accumulate_blocked(
            residuals, w, assign, V, _blocks_for(residuals.shape[0], V))

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
            dA, dmu, dcnt = _accumulate_blocked(
                r, w, a, V, _blocks_for(n, V))
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

    # Balanced allocation runs host-side (tiny sequential greedy over the
    # 2 MB eigenvalue table, vectorized across all V clusters); the [V, D, D]
    # eigvec permutation applies ON DEVICE — round-tripping the matrices
    # through the host measured 31 s (D2H) + 27 s (1-core numpy permute) +
    # 14 s (re-upload) at V=4096 vs 1.6 s for the device gather.
    perms = eigenvalue_allocation_batch(num_buckets, np.asarray(eigvals))
    perms_d = jnp.asarray(perms.astype(np.int32))
    # R[v] = eigvecs[v][:, perm[v]].T  (reference: A[i] = A[i, :, permuted_inds])
    R = jnp.swapaxes(
        jnp.take_along_axis(eigvecs, perms_d[:, None, :], axis=2), 1, 2)
    return R, mu


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

    return _project_blocked(residuals, assignments, Rs, mus, V,
                            _blocks_for(residuals.shape[0], V))


def compute_residuals(data, C):
    """Residuals to nearest centroid (reference: lopq/lopq/model.py:237-240)."""
    from columbiaimagesearch_tpu.ops.kmeans import assign_clusters

    data = jnp.asarray(data, dtype=jnp.float32)
    C = jnp.asarray(C, dtype=jnp.float32)
    assignments, _ = assign_clusters(data, C)
    residuals = data - C[assignments]
    return residuals, assignments
