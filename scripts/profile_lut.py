"""Decompose the query LUT-build stage (the 1.66 ms whale) and test
MXU-friendly alternatives, chained-scan methodology as profile_query.py.

Sub-stages of build_lut (per half):
  a. gather Rs[s][i0]            ([B, Dh, Dh] rows from [V, Dh, Dh])
  b. batched matvec pr = R @ r    (einsum bij,bj->bi, precision=highest)
  c. subquantizer distances       (broadcast diff [B,F,S,Dsub] + reduce)

Alternatives:
  b': batched matvec at default precision
  b'': matvec as dot_general with explicit batch dims
  c': MXU form  ||pr||^2 + ||sub||^2 - 2 pr . sub  (contraction per f)
  whole': fold the Rs gather into the matvec? (not possible — R_b differs
          per cluster; instead test rotating sub codebooks offline is NOT
          equivalent because subs live in the local frame already)
Also: ADC-dist one-hot MXU variant vs gather variant (data-dependent).
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
    V, B, M, S = 4096, 64, 8, 256
    D = 256
    Dh, F = D // 2, M // 2
    Dsub = Dh // F
    Q = 11264

    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    Cs = jax.random.normal(ks[0], (2, V, Dh), jnp.float32)
    Rs = jax.random.normal(ks[1], (2, V, Dh, Dh), jnp.float32) * 0.1
    mus = jax.random.normal(ks[2], (2, V, Dh), jnp.float32) * 0.01
    subs = jax.random.normal(ks[3], (2, F, S, Dsub), jnp.float32)
    x = jax.random.normal(ks[6], (D,), jnp.float32)

    FLOOR_MS[0] = chain_time(lambda c: c * 1.0000001 + 1.0, ())
    log(f"dispatch floor: {FLOOR_MS[0]:.4f} ms/iter")

    def coarse_sel(c, x, Cs):
        x2 = (x + c).reshape(2, Dh)
        d0 = jnp.sum((x2[0][None] - Cs[0]) ** 2, axis=1)
        d1 = jnp.sum((x2[1][None] - Cs[1]) ** 2, axis=1)
        _, i0 = jax.lax.top_k(-d0, B)
        _, i1 = jax.lax.top_k(-d1, B)
        return x2, i0, i1

    # ---- a: Rs gather only --------------------------------------------------
    def stage_a(c, x, Cs, Rs):
        x2, i0, i1 = coarse_sel(c, x, Cs)
        return jnp.sum(Rs[0][i0]) + jnp.sum(Rs[1][i1])

    t = chain_time(stage_a, (x, Cs, Rs))
    log(f"a  (coarse + Rs gather 2x[B,Dh,Dh]): {t:.3f} ms")

    # ---- a+b: + batched matvec, precision=highest --------------------------
    def stage_ab(c, x, Cs, Rs, mus, prec):
        x2, i0, i1 = coarse_sel(c, x, Cs)
        out = jnp.float32(0)
        for s, sel in ((0, i0), (1, i1)):
            r = x2[s][None] - Cs[s][sel] - mus[s][sel]
            pr = jnp.einsum("bij,bj->bi", Rs[s][sel], r, precision=prec)
            out = out + jnp.sum(pr)
        return out

    for prec in ("highest", "default"):
        t = chain_time(lambda c, *a, p=prec: stage_ab(c, *a, p), (x, Cs, Rs, mus))
        log(f"ab (+ batched matvec, {prec}): {t:.3f} ms")

    # matvec as (R @ r) with r as [B, Dh, 1] matmul
    def stage_ab_mm(c, x, Cs, Rs, mus):
        x2, i0, i1 = coarse_sel(c, x, Cs)
        out = jnp.float32(0)
        for s, sel in ((0, i0), (1, i1)):
            r = x2[s][None] - Cs[s][sel] - mus[s][sel]
            pr = jax.lax.dot_general(
                Rs[s][sel], r[:, :, None],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision="highest")[..., 0]
            out = out + jnp.sum(pr)
        return out

    t = chain_time(stage_ab_mm, (x, Cs, Rs, mus))
    log(f"ab (+ dot_general batч matvec, highest): {t:.3f} ms")

    # ---- a+b+c: current broadcast-diff LUT ---------------------------------
    def lut_bcast(pr, subs_s):
        prf = pr.reshape(B, F, Dsub)
        diff = prf[:, :, None, :] - subs_s[None]
        return jnp.sum(diff * diff, axis=-1)

    def stage_abc(c, x, Cs, Rs, mus, subs):
        x2, i0, i1 = coarse_sel(c, x, Cs)
        out = jnp.float32(0)
        for s, sel in ((0, i0), (1, i1)):
            r = x2[s][None] - Cs[s][sel] - mus[s][sel]
            pr = jnp.einsum("bij,bj->bi", Rs[s][sel], r, precision="highest")
            out = out + jnp.sum(lut_bcast(pr, subs[s]))
        return out

    t = chain_time(stage_abc, (x, Cs, Rs, mus, subs))
    log(f"abc (current broadcast-diff LUT): {t:.3f} ms")

    # ---- c': MXU LUT  ||pr||^2 - 2 pr.sub + ||sub||^2 ----------------------
    sub_sq = jnp.sum(subs * subs, axis=-1)  # [2, F, S] precomputed argument

    def lut_mxu(pr, subs_s, sub_sq_s):
        prf = pr.reshape(B, F, Dsub)
        cross = jnp.einsum("bfd,fsd->bfs", prf, subs_s,
                           precision="highest")
        pr_sq = jnp.sum(prf * prf, axis=-1)  # [B, F]
        return pr_sq[:, :, None] - 2.0 * cross + sub_sq_s[None]

    def stage_abc_mxu(c, x, Cs, Rs, mus, subs, sub_sq):
        x2, i0, i1 = coarse_sel(c, x, Cs)
        out = jnp.float32(0)
        for s, sel in ((0, i0), (1, i1)):
            r = x2[s][None] - Cs[s][sel] - mus[s][sel]
            pr = jnp.einsum("bij,bj->bi", Rs[s][sel], r, precision="highest")
            out = out + jnp.sum(lut_mxu(pr, subs[s], sub_sq[s]))
        return out

    t = chain_time(stage_abc_mxu, (x, Cs, Rs, mus, subs, sub_sq))
    log(f"abc' (MXU cross-term LUT): {t:.3f} ms")

    # ---- rotation-free check: how much is the matvec vs the gather? --------
    # Rotate WITHOUT gathering: compute R @ r for ALL V clusters via one
    # big batched matmul?? V=4096 x 128x128 matvec = 67M MACs — probably
    # cheaper than the gather if gather is the bottleneck!
    def stage_all_clusters(c, x, Cs, Rs, mus, subs, sub_sq):
        x2 = (x + c).reshape(2, Dh)
        out = jnp.float32(0)
        for s in (0, 1):
            r = x2[s][None] - Cs[s] - mus[s]            # [V, Dh]
            pr = jnp.einsum("vij,vj->vi", Rs[s], r, precision="highest")
            out = out + jnp.sum(pr)
        return out

    t = chain_time(stage_all_clusters, (x, Cs, Rs, mus, subs, sub_sq))
    log(f"all-V matvec (no gather, V={V}): {t:.3f} ms")

    # ---- ADC distance stage alternatives (data-dependent) ------------------
    lut0 = jax.random.normal(ks[7], (B, F, S), jnp.float32)
    lut1 = jax.random.normal(ks[8], (B, F, S), jnp.float32)
    cand_base = jax.random.randint(ks[9], (Q, M), 0, S, jnp.int32)
    slot0 = jax.random.randint(ks[10], (Q,), 0, B, jnp.int32)
    slot1 = jax.random.randint(ks[11], (Q,), 0, B, jnp.int32)

    def adc_gather(c, cand, lut0, lut1, slot0, slot1):
        # data-dependent: perturb cand by carry (stays in range via mod)
        cand = (cand + c.astype(jnp.int32)) % S
        f_idx = jnp.arange(F, dtype=jnp.int32)[None, :]
        flat0 = lut0.reshape(B * F * S)
        flat1 = lut1.reshape(B * F * S)
        g0 = flat0[(slot0[:, None] * F + f_idx) * S + cand[:, :F]]
        g1 = flat1[(slot1[:, None] * F + f_idx) * S + cand[:, F:]]
        d = jnp.sum(g0, axis=1) + jnp.sum(g1, axis=1)
        tn, ti = jax.lax.top_k(-d, 112)
        return tn[0]

    t = chain_time(adc_gather, (cand_base, lut0, lut1, slot0, slot1))
    log(f"ADC gather + topk (current): {t:.3f} ms")

    def adc_mxu(c, cand, lut0, lut1, slot0, slot1):
        cand = (cand + c.astype(jnp.int32)) % S
        iota_s = jnp.arange(S, dtype=jnp.int32)
        oh0 = (cand[:, :F, None] == iota_s).reshape(Q, F * S)
        oh1 = (cand[:, F:, None] == iota_s).reshape(Q, F * S)
        P0 = jnp.dot(oh0.astype(jnp.bfloat16),
                     lut0.reshape(B, F * S).T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        P1 = jnp.dot(oh1.astype(jnp.bfloat16),
                     lut1.reshape(B, F * S).T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        iota_b = jnp.arange(B, dtype=jnp.int32)
        d = (jnp.sum(P0 * (slot0[:, None] == iota_b), axis=1)
             + jnp.sum(P1 * (slot1[:, None] == iota_b), axis=1))
        tn, ti = jax.lax.top_k(-d, 112)
        return tn[0]

    t = chain_time(adc_mxu, (cand_base, lut0, lut1, slot0, slot1))
    log(f"ADC one-hot MXU + topk: {t:.3f} ms")

    # gather with a single flattened combined index (one gather not two)
    def adc_gather1(c, cand, lut0, lut1, slot0, slot1):
        cand = (cand + c.astype(jnp.int32)) % S
        f_idx = jnp.arange(F, dtype=jnp.int32)[None, :]
        both = jnp.concatenate([lut0.reshape(-1), lut1.reshape(-1)])
        idx0 = (slot0[:, None] * F + f_idx) * S + cand[:, :F]
        idx1 = (slot1[:, None] * F + f_idx) * S + cand[:, F:] + B * F * S
        g = both[jnp.concatenate([idx0, idx1], axis=1)]
        d = jnp.sum(g, axis=1)
        tn, ti = jax.lax.top_k(-d, 112)
        return tn[0]

    t = chain_time(adc_gather1, (cand_base, lut0, lut1, slot0, slot1))
    log(f"ADC single-table gather + topk: {t:.3f} ms")


if __name__ == "__main__":
    main()
