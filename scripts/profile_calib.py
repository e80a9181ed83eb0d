"""Calibrate the chained-scan timing harness: measure trivial bodies to
find the per-iteration floor, then re-measure top-k variants against it."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def chain_time(fn, args, n_iters=100, reps=3):
    @jax.jit
    def run(z, *a):
        def step(c, _):
            return fn(c, *a) * 1e-30, None
        c, _ = jax.lax.scan(step, z, None, length=n_iters)
        return c

    z = jnp.float32(0)
    out = run(z, *args)
    _ = float(np.asarray(out))
    times = []
    for _ in range(reps):
        s = time.perf_counter()
        out = run(z, *args)
        _ = float(np.asarray(out))
        times.append((time.perf_counter() - s) / n_iters * 1e3)
    return float(np.median(times))


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    d_small = jax.random.normal(key, (1024,), jnp.float32)
    d_mid = jax.random.normal(key, (4096,), jnp.float32)
    d_big = jax.random.normal(key, (11264,), jnp.float32)
    d_2d = jax.random.normal(key, (11, 1024), jnp.float32)

    t = chain_time(lambda c: c * 1.0000001 + 1.0, ())
    log(f"trivial scalar body: {t:.4f} ms")

    t = chain_time(lambda c, d: jnp.sum(d + c), (d_big,))
    log(f"sum of 11264: {t:.4f} ms")

    for name, d in [("1024", d_small), ("4096", d_mid), ("11264", d_big)]:
        t = chain_time(lambda c, d: jax.lax.top_k(-(d + c), 112)[0][0], (d,))
        log(f"top_k({name} -> 112): {t:.4f} ms")

    t = chain_time(lambda c, d: jax.lax.top_k(-(d + c), 112)[0][0, 0],
                   (d_2d,))
    log(f"top_k([11,1024] -> 112 rowwise): {t:.4f} ms")

    t = chain_time(
        lambda c, d: jax.lax.approx_max_k(-(d + c), 112)[0][0], (d_big,))
    log(f"approx_max_k(11264 -> 112): {t:.4f} ms")

    t = chain_time(lambda c, d: jnp.max(d + c), (d_big,))
    log(f"max of 11264: {t:.4f} ms")

    # argmin-style: the K=1 case
    t = chain_time(lambda c, d: jax.lax.top_k(-(d + c), 1)[0][0], (d_big,))
    log(f"top_k(11264 -> 1): {t:.4f} ms")

    # sort-based
    t = chain_time(lambda c, d: jnp.sort(d + c)[0], (d_big,))
    log(f"full sort 11264: {t:.4f} ms")


if __name__ == "__main__":
    main()
