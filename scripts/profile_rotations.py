"""Sub-stage decomposition of compute_local_rotations + projection at the
1M / V=4096 training config: accumulate | eigh | D2H | host-permute |
upload | project. Identifies whether compute or relay transfers dominate."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from columbiaimagesearch_tpu.ops.eigen_alloc import (
        eigenvalue_allocation_batch,
    )
    from columbiaimagesearch_tpu.ops.kmeans import _assign_chunked, _pick_chunk
    from columbiaimagesearch_tpu.ops.rotations import (
        _accumulate_blocked,
        _blocks_for,
        _project_blocked,
    )
    from columbiaimagesearch_tpu.utils.chunking import pad_rows

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    V, D = 4096, 128
    log(f"devices {jax.devices()}")
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (n, D), jnp.float32)
    C = jax.random.normal(jax.random.PRNGKey(1), (V, D), jnp.float32)
    _ = float(jnp.sum(C[0]))  # enter real blocking mode

    chunk = _pick_chunk(n)
    Xp, nn = pad_rows(X, chunk)
    w = jnp.zeros(Xp.shape[0], jnp.float32).at[:nn].set(1.0)

    t = time.perf_counter()
    assign, _md = _assign_chunked(Xp, C, chunk)
    assign.block_until_ready()
    log(f"assign: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    residuals = Xp - C[assign]
    residuals.block_until_ready()
    log(f"residuals: {time.perf_counter()-t:.1f}s")

    nb = _blocks_for(Xp.shape[0], V)
    for rep in range(2):
        t = time.perf_counter()
        A, mu, cnt = _accumulate_blocked(residuals, w, assign, V, nb)
        A.block_until_ready()
        log(f"accumulate_blocked rep{rep}: {time.perf_counter()-t:.1f}s")

    mu_n = mu / jnp.maximum(cnt, 1.0)[:, None]
    denom = jnp.maximum(2.0 * (cnt - 1.0), 1.0)[:, None, None]
    cov = (A + jnp.swapaxes(A, 1, 2)) / denom - jnp.einsum(
        "vd,ve->vde", mu_n, mu_n)
    cov.block_until_ready()
    for rep in range(2):
        t = time.perf_counter()
        eigvals, eigvecs = jnp.linalg.eigh(cov)
        eigvecs.block_until_ready()
        log(f"batched eigh rep{rep}: {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    ev_h = np.asarray(eigvals)
    log(f"eigvals D2H (2 MB): {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    evec_h = np.asarray(eigvecs)
    log(f"eigvecs D2H (268 MB): {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    perms = eigenvalue_allocation_batch(2, ev_h)
    log(f"host eigenvalue_allocation_batch: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    R = np.take_along_axis(evec_h, perms[:, None, :], axis=2).transpose(0, 2, 1)
    R = np.ascontiguousarray(R)
    log(f"host permute+transpose: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    Rd = jnp.asarray(R)
    Rd.block_until_ready()
    log(f"R upload H2D (268 MB): {time.perf_counter()-t:.1f}s")

    for rep in range(2):
        t = time.perf_counter()
        proj = _project_blocked(residuals[:n], assign[:n], Rd, mu_n, V,
                                _blocks_for(n, V))
        proj.block_until_ready()
        log(f"project_blocked rep{rep}: {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    proj_h = np.asarray(proj)
    log(f"projection D2H (512 MB): {time.perf_counter()-t:.1f}s")

    # device-side permutation alternative: apply perms with a device gather
    t = time.perf_counter()
    perms_d = jnp.asarray(perms)
    R_dev = jnp.take_along_axis(eigvecs, perms_d[:, None, :], axis=2
                                ).transpose(0, 2, 1)
    R_dev.block_until_ready()
    log(f"device permute from eigvecs: {time.perf_counter()-t:.1f}s")


if __name__ == "__main__":
    main()
