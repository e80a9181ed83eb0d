"""Fully on-device batched LOPQ encoding.

The role of the reference's per-point ``model.predict`` loops spread across a
multiprocessing pool (reference: lopq/lopq/utils.py:178-218
``compute_codes_parallel``/``compute_codes_notparallel``): here one jitted
program codes an entire batch — coarse assignment as two MXU matmuls, local
projection as chunked gathered einsums, fine assignment as per-split matmuls —
and only the packed codes ever leave the device.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def lopq_encode(Cs, Rs, mus, subs, X, chunk: int = 2048):
    """Encode a batch of vectors.

    :param Cs: [2, V, Dh] coarse codebooks
    :param Rs: [2, V, Dh, Dh] local rotations (apply as R @ r)
    :param mus: [2, V, Dh] residual means
    :param subs: [2, F, S, Dsub] subquantizer codebooks
    :param X: [N, D] float32, N a multiple of ``chunk``
    :returns: (coarse [N, 2] int32, fine [N, M] int32)
    """
    N, D = X.shape
    F = subs.shape[1]
    Dh = Cs.shape[2]
    Dsub = subs.shape[3]

    c2 = jnp.sum(Cs * Cs, axis=2)  # [2, V]
    s2 = jnp.sum(subs * subs, axis=3)  # [2, F, S]

    def one_chunk(xc):
        xh = xc.reshape(chunk, 2, Dh)
        coarse = []
        projected = []
        for s in range(2):
            xs = xh[:, s, :]
            prod = jnp.dot(xs, Cs[s].T, preferred_element_type=jnp.float32,
                           precision="highest")
            a = jnp.argmin(c2[s][None, :] - 2.0 * prod, axis=1).astype(jnp.int32)
            coarse.append(a)
            r = xs - Cs[s][a] - mus[s][a]
            pr = jnp.einsum("nij,nj->ni", Rs[s][a], r, precision="highest")
            projected.append(pr.reshape(chunk, F, Dsub))
        fine = []
        for s in range(2):
            # [chunk, F, Dsub] x [F, S, Dsub] -> [chunk, F, S]
            prod = jnp.einsum("nfd,fsd->nfs", projected[s], subs[s],
                              precision="highest")
            d2 = s2[s][None, :, :] - 2.0 * prod
            fine.append(jnp.argmin(d2, axis=2).astype(jnp.int32))
        return jnp.stack(coarse, axis=1), jnp.concatenate(fine, axis=1)

    Xc = X.reshape(N // chunk, chunk, D)
    coarse, fine = jax.lax.map(one_chunk, Xc)
    return coarse.reshape(N, 2), fine.reshape(N, 2 * F)
