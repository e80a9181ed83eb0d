"""Stage-timing of the full LOPQ fit at the training-bench config
(1M x 256-d, V=4096, M=8, S=256, 10 Lloyd iters, n_init=1) to locate
where the 487 s wall-clock goes. Wall-clock per stage incl. compiles
(second run shows warm numbers)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from columbiaimagesearch_tpu.index.model import (
        project_residuals_to_local,
    )
    from columbiaimagesearch_tpu.ops.kmeans import fit_kmeans_auto
    from columbiaimagesearch_tpu.ops.rotations import compute_local_rotations

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    V = 4096
    M = 8
    S = 256
    iters = 10

    rng = np.random.RandomState(0)
    comp = rng.randn(256, 256).astype(np.float32)
    comp /= np.linalg.norm(comp, axis=1, keepdims=True)
    data = (comp[rng.randint(0, 256, n)]
            + 0.3 * rng.randn(n, 256).astype(np.float32))
    log(f"devices {jax.devices()}; n={n}")
    half1, half2 = np.split(data, 2, axis=1)

    t = time.perf_counter()
    C1 = np.asarray(fit_kmeans_auto(half1, V, iters, 1, seed=0))
    log(f"coarse kmeans half1: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    C2 = np.asarray(fit_kmeans_auto(half2, V, iters, 1, seed=1))
    log(f"coarse kmeans half2 (warm): {time.perf_counter()-t:.1f}s")

    # Everything below stays device-resident, mirroring index/model.py
    # train(); a np.asarray here would add ~45 s of relay D2H per matrix
    # and mis-attribute it to the stage.
    t = time.perf_counter()
    Rs1, mu1, a1, r1 = compute_local_rotations(half1, C1, M // 2)
    Rs1.block_until_ready()
    log(f"local rotations half1: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    Rs2, mu2, a2, r2 = compute_local_rotations(half2, C2, M // 2)
    Rs2.block_until_ready()
    log(f"local rotations half2 (warm): {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    p1 = project_residuals_to_local(r1, a1, Rs1, mu1)
    p1.block_until_ready()
    log(f"project residuals half1: {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    subs = []
    width = p1.shape[1] // (M // 2)
    for i in range(M // 2):
        d = p1[:, i * width:(i + 1) * width]
        subs.append(fit_kmeans_auto(d, S, iters, 1, seed=100 + i))
        subs[-1].block_until_ready()
    log(f"4 subquantizers half1: {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    Rs_host = (np.asarray(Rs1), np.asarray(Rs2))
    log(f"final Rs D2H (2x268 MB, the model's one host copy): "
        f"{time.perf_counter()-t:.1f}s")


if __name__ == "__main__":
    main()
