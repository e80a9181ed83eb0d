"""Profile slot-resolution (stage 3) alternatives at headline shapes.

Current shipped: scatter-add cell-end markers + cumsum(Q) + packed meta
row-gather. Alternative: b_for_j[j] = #{cells i: scs_i <= j} as a direct
[Q, BB] compare-reduce (no scatter, no long cumsum).
Chained-scan methodology with floor subtraction (see profile_query.py).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


FLOOR_MS = [0.0]


def chain_time(fn, args, n_iters=200, reps=3):
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
    return float(np.median(times)) - FLOOR_MS[0]


def main():
    V, B, Q = 4096, 64, 11264
    BB = B * B
    N = 10 * (1 << 20)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    # realistic cell_start: sorted random cells
    cells = jnp.sort(jax.random.randint(ks[0], (N,), 0, V * V, jnp.int32))
    cell_start = jnp.searchsorted(
        cells, jnp.arange(V * V + 1, dtype=jnp.int32)).astype(jnp.int32)
    cell_ids_base = jax.random.randint(ks[1], (BB,), 0, V * V - 1, jnp.int32)
    a_idx = jax.random.randint(ks[2], (BB,), 0, B, jnp.int32)
    b_idx = jax.random.randint(ks[3], (BB,), 0, B, jnp.int32)
    quota = jnp.asarray(10_000, jnp.int32)
    jax.block_until_ready(cell_start)
    log(f"setup done; devices {jax.devices()}")

    FLOOR_MS[0] = chain_time(lambda c: c * 1.0000001 + 1.0, ())
    log(f"floor {FLOOR_MS[0]:.4f} ms")

    def common(c, cell_ids, cell_start):
        cell_ids = (cell_ids + c.astype(jnp.int32)) % (V * V - 1)
        bounds = cell_start[cell_ids[:, None]
                            + jnp.arange(2, dtype=jnp.int32)[None, :]]
        starts = bounds[:, 0]
        counts = bounds[:, 1] - starts
        csum = jnp.cumsum(counts)
        selected = (csum - counts) < quota
        sel_counts = jnp.where(selected, counts, 0)
        scs = jnp.cumsum(sel_counts)
        return starts, sel_counts, scs

    def shipped(c, cell_ids, cell_start, a_idx, b_idx):
        starts, sel_counts, scs = common(c, cell_ids, cell_start)
        j = jnp.arange(Q, dtype=jnp.int32)
        markers = jnp.zeros(Q + 1, jnp.int32).at[jnp.minimum(scs, Q)].add(1)
        b_for_j = jnp.minimum(jnp.cumsum(markers)[:Q], BB - 1)
        meta = jnp.stack([scs, sel_counts, starts, a_idx, b_idx,
                          jnp.zeros_like(scs), jnp.zeros_like(scs),
                          jnp.zeros_like(scs)], axis=1)
        mrow = meta[b_for_j]
        rows = mrow[:, 2] + (j - (mrow[:, 0] - mrow[:, 1]))
        return jnp.sum(rows).astype(jnp.float32)

    t = chain_time(shipped, (cell_ids_base, cell_start, a_idx, b_idx))
    log(f"shipped (scatter+cumsum+meta-gather): {t:.3f} ms")

    def comparered(c, cell_ids, cell_start, a_idx, b_idx):
        starts, sel_counts, scs = common(c, cell_ids, cell_start)
        j = jnp.arange(Q, dtype=jnp.int32)
        # b_for_j[j] = #{i : scs_i <= j} via tiled compare-reduce
        b_for_j = jnp.sum(
            (scs[None, :] <= j[:, None]).astype(jnp.int32), axis=1)
        b_for_j = jnp.minimum(b_for_j, BB - 1)
        meta = jnp.stack([scs, sel_counts, starts, a_idx, b_idx,
                          jnp.zeros_like(scs), jnp.zeros_like(scs),
                          jnp.zeros_like(scs)], axis=1)
        mrow = meta[b_for_j]
        rows = mrow[:, 2] + (j - (mrow[:, 0] - mrow[:, 1]))
        return jnp.sum(rows).astype(jnp.float32)

    t = chain_time(comparered, (cell_ids_base, cell_start, a_idx, b_idx))
    log(f"compare-reduce b_for_j: {t:.3f} ms")

    # isolate the bounds gather from the 67MB offsets table
    def bounds_only(c, cell_ids, cell_start):
        cell_ids = (cell_ids + c.astype(jnp.int32)) % (V * V - 1)
        bounds = cell_start[cell_ids[:, None]
                            + jnp.arange(2, dtype=jnp.int32)[None, :]]
        return jnp.sum(bounds).astype(jnp.float32)

    t = chain_time(bounds_only, (cell_ids_base, cell_start))
    log(f"bounds gather only: {t:.3f} ms")

    def twogather(c, cell_ids, cell_start):
        cell_ids = (cell_ids + c.astype(jnp.int32)) % (V * V - 1)
        starts = cell_start[cell_ids]
        ends = cell_start[cell_ids + 1]
        return jnp.sum(starts + ends).astype(jnp.float32)

    t = chain_time(twogather, (cell_ids_base, cell_start))
    log(f"two scalar gathers: {t:.3f} ms")


if __name__ == "__main__":
    main()
