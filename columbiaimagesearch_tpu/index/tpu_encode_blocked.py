"""Cluster-blocked batched LOPQ encoding — the high-throughput index builder.

The naive batched encoder (tpu_encode.py) gathers a [Dh, Dh] rotation matrix
per point: at 10M points x 64 KB that is ~650 GB of HBM traffic. This encoder
restores memory locality the TPU way:

1. assign points to coarse clusters (MXU matmul argmin),
2. sort points by cluster and pad every cluster's run to a block multiple,
3. one rotation gather per *block* instead of per point
   ([NB, Dh, Dh] where NB ~ N/BLK) feeding a single batched matmul,
4. scatter projections back to the original order.

Traffic drops ~BLK-fold (256x by default) and the projection runs at MXU
speed. Used by LOPQModel.predict_batch for large batches and by the bench
index build.
"""

import functools

import jax
import jax.numpy as jnp

from columbiaimagesearch_tpu.utils.chunking import round_up

BLK = 256


@functools.partial(jax.jit, static_argnames=("V", "n_blocks"))
def _project_blocked_half(x, C, R, mu, V: int, n_blocks: int):
    """One coarse split: returns (assignments [N], projections [N, Dh]).

    N must satisfy n_blocks * BLK >= N + V * (BLK - 1) is NOT required;
    n_blocks must be >= ceil(N/BLK) + V (worst-case padding blocks).
    """
    N, Dh = x.shape

    # 1. coarse assignment
    c2 = jnp.sum(C * C, axis=1)
    prod = jnp.dot(x, C.T, preferred_element_type=jnp.float32,
                   precision="highest")
    a = jnp.argmin(c2[None, :] - 2.0 * prod, axis=1).astype(jnp.int32)

    # 2. sort by cluster; compute padded layout
    order = jnp.argsort(a, stable=True)               # [N] original index
    a_sorted = a[order]
    counts = jax.ops.segment_sum(jnp.ones(N, jnp.int32), a,
                                 num_segments=V)
    padded = ((counts + BLK - 1) // BLK) * BLK        # per-cluster padded len
    pstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(padded).astype(jnp.int32)])
    cstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    # position of sorted point i in the padded buffer
    rank = jnp.arange(N, dtype=jnp.int32) - cstart[a_sorted]
    ppos = pstart[a_sorted] + rank                    # [N]

    Npad = n_blocks * BLK
    xp = jnp.zeros((Npad, Dh), dtype=x.dtype)
    shifted = x[order] - mu[a_sorted]                 # residual minus mean
    # also subtract centroid: full residual r - mu = x - C[a] - mu[a]
    shifted = shifted - C[a_sorted]
    xp = xp.at[ppos].set(shifted)

    # block -> cluster map: block b belongs to the cluster whose padded
    # range covers b*BLK (clusters with zero padded length are skipped by
    # searchsorted's right side).
    bidx = jnp.arange(n_blocks, dtype=jnp.int32) * BLK
    bcluster = jnp.clip(
        jnp.searchsorted(pstart[1:], bidx, side="right"), 0, V - 1)

    # 3. batched per-block projection on the MXU
    Rb = R[bcluster]                                  # [NB, Dh, Dh]
    xb = xp.reshape(n_blocks, BLK, Dh)
    pb = jax.lax.dot_general(
        xb, Rb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [NB, BLK, Dh]

    # 4. gather back to original order
    proj_sorted = pb.reshape(Npad, Dh)[ppos]          # [N] sorted order
    proj = jnp.zeros_like(proj_sorted).at[order].set(proj_sorted)
    return a, proj


@functools.partial(jax.jit, static_argnames=("V", "n_blocks"))
def lopq_encode_blocked(Cs, Rs, mus, subs, X, V: int, n_blocks: int):
    """Full blocked encode: [N, D] -> (coarse [N, 2] int32, fine [N, M]).

    ``n_blocks`` must be >= ceil(N/BLK) + V (worst-case per-cluster padding);
    use :func:`blocks_needed`.
    """
    N, D = X.shape
    F = subs.shape[1]
    Dh = D // 2
    Dsub = subs.shape[3]

    coarse = []
    fine = []
    s2 = jnp.sum(subs * subs, axis=3)                 # [2, F, S]
    for s in range(2):
        xh = jax.lax.slice_in_dim(X, s * Dh, (s + 1) * Dh, axis=1)
        a, proj = _project_blocked_half(xh, Cs[s], Rs[s], mus[s], V, n_blocks)
        coarse.append(a)
        prf = proj.reshape(N, F, Dsub)
        prod = jnp.einsum("nfd,fsd->nfs", prf, subs[s], precision="highest")
        d2 = s2[s][None, :, :] - 2.0 * prod
        fine.append(jnp.argmin(d2, axis=2).astype(jnp.int32))
    return jnp.stack(coarse, axis=1), jnp.concatenate(fine, axis=1)


def blocks_needed(n: int, V: int) -> int:
    """Static block count covering N points with worst-case padding."""
    return round_up(n, BLK) // BLK + V
