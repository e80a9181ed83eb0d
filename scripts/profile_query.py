"""Stage profiling of the fused probed query at headline scale.

Builds a synthetic 10.5M-row CSR index directly (random codes + random
model tables — stage timings don't depend on trained values), then times
*cumulative prefixes* of the kernel, each fully data-dependent on the
chained carry so XLA cannot hoist anything out of the timing scan.
Marginal cost of stage k = time(P_k) - time(P_{k-1}).

Methodology: chained scan (200 iterations inside one jit, data dependency
between iterations, scalar D2H close), minus a measured trivial-body floor
(the dev tunnel's ~35 ms dispatch divided by iterations).

Used to decide kernel-optimization work; results recorded in
docs/BENCHMARKS.md. Not part of the driver bench.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from columbiaimagesearch_tpu.index.csr import build_csr_device
from columbiaimagesearch_tpu.index.tpu_query import lopq_query
from columbiaimagesearch_tpu.utils.chunking import round_up


def log(msg):
    print(msg, file=sys.stderr, flush=True)


FLOOR_MS = [0.0]


def chain_time(fn, args, n_iters=200, reps=3):
    """Median per-iteration time of fn chained n_iters times in one jit,
    minus the trivial-body floor. fn(carry, *args) -> scalar."""

    @jax.jit
    def run(z, *a):
        def step(c, _):
            return fn(c, *a) * 1e-30, None
        c, _ = jax.lax.scan(step, z, None, length=n_iters)
        return c

    z = jnp.float32(0)
    out = run(z, *args)
    _ = float(np.asarray(out))  # compile + enter real blocking mode
    times = []
    for _ in range(reps):
        s = time.perf_counter()
        out = run(z, *args)
        _ = float(np.asarray(out))
        times.append((time.perf_counter() - s) / n_iters * 1e3)
    return float(np.median(times)) - FLOOR_MS[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 * (1 << 20))
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--V", type=int, default=4096)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--quota", type=int, default=10_000)
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--full-only", action="store_true",
                    help="time only the shipped kernel, skip prefixes")
    ap.add_argument("--lut-impl", default="stream",
                    choices=["stream", "pallas", "auto"])
    args = ap.parse_args()

    V, M, B = args.V, args.M, args.B
    D = args.dim
    Dh = D // 2
    F = M // 2
    S = 256
    Dsub = Dh // F
    Q = round_up(args.quota + 1024, 1024)
    K = round_up(args.limit, 16)

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    Cs = jax.random.normal(ks[0], (2, V, Dh), jnp.float32)
    Rs = jax.random.normal(ks[1], (2, V, Dh, Dh), jnp.float32) * 0.1
    mus = jax.random.normal(ks[2], (2, V, Dh), jnp.float32) * 0.01
    subs = jax.random.normal(ks[3], (2, F, S, Dsub), jnp.float32)

    coarse = jax.random.randint(ks[4], (args.n, 2), 0, V, jnp.int32)
    fine = jax.random.randint(ks[5], (args.n, M), 0, S, jnp.int32
                              ).astype(jnp.uint8)
    codes, cell_start, order = build_csr_device(coarse, fine, V)
    jax.block_until_ready(cell_start)
    log(f"[{time.time()-t0:.1f}s] synthetic CSR at N={args.n}")

    x = jax.random.normal(ks[6], (D,), jnp.float32)
    quota = jnp.asarray(args.quota, jnp.int32)

    FLOOR_MS[0] = chain_time(lambda c: c * 1.0000001 + 1.0, ())
    log(f"dispatch floor: {FLOOR_MS[0]:.4f} ms/iter (subtracted below)")

    # ---- cumulative prefixes ------------------------------------------------
    # Every prefix perturbs x by the carry, so all stages re-execute each
    # iteration; the returned scalar sums everything computed so far so no
    # stage is dead code.

    def prefix(c, x, Cs, Rs, mus, subs, codes, cell_start, quota, *, upto):
        acc = jnp.float32(0)
        x2 = (x + c).reshape(2, Dh)
        d0 = jnp.sum((x2[0][None] - Cs[0]) ** 2, axis=1)
        d1 = jnp.sum((x2[1][None] - Cs[1]) ** 2, axis=1)
        nd0, i0 = jax.lax.top_k(-d0, B)
        nd1, i1 = jax.lax.top_k(-d1, B)
        td0, td1 = -nd0, -nd1
        if upto == 1:  # coarse only
            return jnp.sum(td0) + jnp.sum(td1) + i0[0] + i1[0]
        grid = td0[:, None] + td1[None, :]
        flat = grid.reshape(-1)
        _, order_ = jax.lax.top_k(-flat, B * B)
        a_idx, b_idx = order_ // B, order_ % B
        cell_ids = i0[a_idx] * V + i1[b_idx]
        if upto == 2:  # + grid order
            return jnp.sum(cell_ids).astype(jnp.float32)
        starts = cell_start[cell_ids]
        counts = cell_start[cell_ids + 1] - starts
        csum = jnp.cumsum(counts)
        selected = (csum - counts) < quota
        sel_counts = jnp.where(selected, counts, 0)
        scs = jnp.cumsum(sel_counts)
        jj = jnp.arange(Q, dtype=jnp.int32)
        markers = jnp.zeros(Q + 1, jnp.int32).at[jnp.minimum(scs, Q)].add(1)
        b_for_j = jnp.minimum(jnp.cumsum(markers)[:Q], B * B - 1)
        bucket_begin = scs[b_for_j] - sel_counts[b_for_j]
        rows = starts[b_for_j] + (jj - bucket_begin)
        valid = jj < jnp.minimum(scs[-1], Q)
        rows = jnp.where(valid, rows, 0)
        if upto == 3:  # + slot resolution
            return jnp.sum(rows).astype(jnp.float32)
        cand = codes[rows].astype(jnp.int32)
        if upto == 4:  # + code gather
            return jnp.sum(cand).astype(jnp.float32) + jnp.sum(rows) * 0.0

        def build_lut(s, sel):
            Csel = Cs[s][sel]
            r = x2[s][None] - Csel - mus[s][sel]
            pr = jnp.einsum("bij,bj->bi", Rs[s][sel], r,
                            precision="highest")
            prf = pr.reshape(B, F, Dsub)
            diff = prf[:, :, None, :] - subs[s][None]
            return jnp.sum(diff * diff, axis=-1)

        lut0 = build_lut(0, i0)
        lut1 = build_lut(1, i1)
        if upto == 5:  # + LUT build
            return (jnp.sum(lut0) + jnp.sum(lut1)
                    + jnp.sum(cand).astype(jnp.float32) * 1e-12)
        slot0 = a_idx[b_for_j]
        slot1 = b_idx[b_for_j]
        f_idx = jnp.arange(F, dtype=jnp.int32)[None, :]
        flat0 = lut0.reshape(B * F * S)
        flat1 = lut1.reshape(B * F * S)
        g0 = flat0[(slot0[:, None] * F + f_idx) * S + cand[:, :F]]
        g1 = flat1[(slot1[:, None] * F + f_idx) * S + cand[:, F:]]
        dists = jnp.sum(g0, axis=1) + jnp.sum(g1, axis=1)
        dists = jnp.where(valid, dists, jnp.inf)
        if upto == 6:  # + ADC distance
            return jnp.sum(jnp.where(valid, dists, 0.0))
        top_neg, top_idx = jax.lax.top_k(-dists, K)
        top_rows = jnp.where(jnp.isfinite(top_neg), rows[top_idx], -1)
        return top_neg[0] + top_rows[0].astype(jnp.float32) * 1e-12

    if args.full_only:
        def full0(c, x, Cs, Rs, mus, subs, codes, cell_start, quota):
            rows, dists, total, ncells, _gok = lopq_query(
                x + c, Cs, Rs, mus, subs, codes, cell_start, quota,
                V=V, B=B, Q=Q, K=K, lut_impl=args.lut_impl)
            return dists[0]

        t = chain_time(full0, (x, Cs, Rs, mus, subs, codes, cell_start,
                               quota))
        log(f"FULL shipped kernel (lut={args.lut_impl}): {t:.3f} ms")
        return

    names = {1: "coarse top-B", 2: "+ grid order (topk B*B)",
             3: "+ slot resolution", 4: "+ code gather",
             5: "+ LUT build", 6: "+ ADC dists", 7: "+ final topk"}
    base = (x, Cs, Rs, mus, subs, codes, cell_start, quota)
    prev = 0.0
    for upto in range(1, 8):
        t = chain_time(
            lambda c, *a, u=upto: prefix(c, *a, upto=u), base)
        log(f"P{upto} {names[upto]:28s}: {t:7.3f} ms  (marginal "
            f"{t - prev:+.3f})")
        prev = t

    def full(c, x, Cs, Rs, mus, subs, codes, cell_start, quota):
        rows, dists, total, ncells, _gok = lopq_query(
            x + c, Cs, Rs, mus, subs, codes, cell_start, quota,
            V=V, B=B, Q=Q, K=K)
        return dists[0]

    t = chain_time(full, base)
    log(f"FULL shipped kernel: {t:.3f} ms")


if __name__ == "__main__":
    main()
