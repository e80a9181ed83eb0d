#!/usr/bin/env python
"""Recall@k evaluation: probed vs exact vs brute force.

The measurement the reference carries as a library but never wires in
(reference: lopq/lopq/eval.py:92-142, TODO at searcher_lopqhbase.py:477-480):
train a model on synthetic clustered data, index N vectors, and report
recall@{1,10,100} of (a) the fused probed searcher at the production quota
and (b) the exhaustive Pallas kernel, against brute-force ground truth.

Usage: python scripts/eval_recall.py --n 1000000 --V 256 --queries 100
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--train-n", type=int, default=100_000)
    ap.add_argument("--V", type=int, default=256)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--quota", type=int, default=10_000)
    ap.add_argument("--probe-width", type=int, default=None,
                    help="clusters probed per split (B; default min(V, 64))."
                         " At large V the probe grid, not the quota, bounds"
                         " the candidate pool: B*B cells cover ~B*B*N/V^2"
                         " candidates")
    ap.add_argument("--query-noise", type=float, default=0.1,
                    help="queries are indexed points + this noise (the "
                         "near-duplicate retrieval scenario the system "
                         "serves); 0 disables and samples fresh points")
    ap.add_argument("--rerank-dtype", default="auto",
                    choices=("auto", "float32", "bfloat16"),
                    help="resident rerank-store dtype for the fused-rerank "
                         "row; at 10.5M x 256 'auto' picks float32 (11.3 GB "
                         "— under the 13.5 GB budget) which leaves too "
                         "little HBM for top-rung wave transients: pass "
                         "bfloat16 there (the r04-measured production "
                         "config)")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--skip-rerank", action="store_true")
    ap.add_argument("--stream-synth", action="store_true",
                    help="regenerate data chunks from seeds instead of "
                         "holding X in RAM (needed at 100M: 100M x 256 "
                         "f32 is 102 GB); implies --skip-exact/--skip-"
                         "rerank (both need random row access)")
    ap.add_argument("--probe-widths", default=None,
                    help="comma list to sweep, 0 = adaptive ladder "
                         "(e.g. '64,256,0'); default: one run at "
                         "--probe-width")
    ap.add_argument("--quotas", default=None,
                    help="comma list of quotas to sweep (each crossed "
                         "with --probe-widths); default: --quota only")
    ap.add_argument("--out", default=None,
                    help="write a benchmarks/ JSON artifact here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the config.update is the "
                         "only override that beats sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from columbiaimagesearch_tpu.index.model import LOPQModel
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU
    from columbiaimagesearch_tpu.index.tpu_encode import lopq_encode

    t0 = time.time()
    rng = np.random.RandomState(0)
    n_comp = 512
    comp = rng.randn(n_comp, args.dim).astype(np.float32)
    comp /= np.linalg.norm(comp, axis=1, keepdims=True)

    def synth(n, seed):
        r = np.random.RandomState(seed)
        return (comp[r.randint(0, n_comp, n)]
                + 0.25 * r.randn(n, args.dim)).astype(np.float32)

    # Chunked deterministic data access: chunk c of CH rows regenerates
    # from seed 1000+c, so streaming mode never materializes X.
    CH = 1 << 21

    # Streaming chunks are synthesized ON DEVICE (jax PRNG): the host
    # MT19937 path costs ~151 s per 2M x 256 chunk on this 1-core box
    # (~2.1 h per full pass at 100M, paid three times: queries, ground
    # truth, encode) and then ships 2.1 GB/chunk over the relay. The
    # device generator emits a chunk in milliseconds and the raw vectors
    # never cross the host boundary — ground truth reduces on device to
    # [queries] scalars and encode returns only the codes. Dataset RNG
    # therefore differs from the non-streaming (host-seed) path; each
    # artifact records stream_synth so runs are only compared like for
    # like. comp rides as a jit ARGUMENT (closure-captured device arrays
    # are baked into the HLO and re-ship per call — CLAUDE.md).
    comp_dev = jnp.asarray(comp)

    @jax.jit
    def _synth_fn(comp_d, c):
        key = jax.random.fold_in(jax.random.PRNGKey(1000), c)
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (CH,), 0, n_comp)
        return (comp_d[idx]
                + 0.25 * jax.random.normal(k2, (CH, args.dim), jnp.float32))

    def _synth_dev(c):
        return _synth_fn(comp_dev, c)

    train = synth(args.train_n, 1)
    print(f"[{time.time()-t0:.0f}s] training V={args.V} M={args.M}",
          file=sys.stderr, flush=True)
    model = LOPQModel(V=args.V, M=args.M, subquantizer_clusters=256)
    model.fit(train, n_init=1, random_state=0)
    print(f"[{time.time()-t0:.0f}s] trained; building queries",
          file=sys.stderr, flush=True)

    # Non-streaming keeps the single-seed dataset of earlier rounds
    # (artifact comparability); streaming regenerates per-chunk seeds.
    X = None if args.stream_synth else synth(args.n, 2)

    def rows_of(src):
        """Arbitrary rows by index; streaming mode regenerates each row's
        chunk on device and pulls only the selected rows."""
        if X is not None:
            return X[src]
        out = np.empty((len(src), args.dim), np.float32)
        src = np.asarray(src)
        for c in np.unique(src // CH):
            sel = np.nonzero(src // CH == c)[0]
            xc = _synth_dev(jnp.int32(c))
            out[sel] = np.asarray(xc[jnp.asarray(src[sel] % CH)])
        return out

    if args.query_noise > 0:
        r = np.random.RandomState(3)
        src = r.randint(0, args.n, args.queries)
        queries = (rows_of(src) + args.query_noise
                   * r.randn(args.queries, args.dim)).astype(np.float32)
    else:
        queries = synth(args.queries, 3)

    # Brute-force ground truth, streaming X from host in chunks so the
    # raw vectors never need to fit in HBM (at n=10.5M, dim=256 the full
    # matrix is 10.7 GB — holding it twice OOMs a 16 GB chip).
    print(f"[{time.time()-t0:.0f}s] brute-force ground truth",
          file=sys.stderr, flush=True)
    qd = jnp.asarray(queries)

    @jax.jit
    def chunk_nn(qd, Xc):
        d = (jnp.sum(Xc * Xc, 1)[None, :]
             - 2.0 * jnp.dot(qd, Xc.T, preferred_element_type=jnp.float32,
                             precision="highest"))
        i = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
        return dmin, i

    @jax.jit
    def chunk_nn_dev(comp_d, qd, c, n_valid):
        # Fused synth + NN: the chunk never exists off-device; rows past
        # the dataset end (final partial chunk) are masked to +inf.
        Xc = _synth_fn(comp_d, c)
        d = (jnp.sum(Xc * Xc, 1)[None, :]
             - 2.0 * jnp.dot(qd, Xc.T, preferred_element_type=jnp.float32,
                             precision="highest"))
        d = jnp.where(jnp.arange(CH)[None, :] < n_valid, d, jnp.inf)
        i = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
        return dmin, i

    # Global best indices accumulate on host in int64: device int32 would
    # wrap past 2^31 rows (jax x64 is off, so jnp.int64 silently degrades).
    best_d = np.full(len(queries), np.inf, np.float32)
    best_i = np.zeros(len(queries), np.int64)
    for c in range((args.n + CH - 1) // CH):
        s0 = c * CH
        if X is None:
            dmin, i = chunk_nn_dev(comp_dev, qd, jnp.int32(c),
                                   jnp.int32(min(CH, args.n - s0)))
        else:
            dmin, i = chunk_nn(qd, jnp.asarray(X[s0:s0 + CH]))
        dmin, i = np.asarray(dmin), np.asarray(i)
        upd = dmin < best_d
        best_d = np.where(upd, dmin, best_d)
        best_i = np.where(upd, s0 + i.astype(np.int64), best_i)
        if c % 8 == 7:
            print(f"[{time.time()-t0:.0f}s] gt "
                  f"{min(s0 + CH, args.n)}/{args.n}",
                  file=sys.stderr, flush=True)
    nns = best_i

    Cs = jnp.stack([jnp.asarray(C) for C in model.Cs])
    Rs = jnp.stack([jnp.asarray(R) for R in model.Rs])
    mus = jnp.stack([jnp.asarray(m) for m in model.mus])
    subs = jnp.stack([jnp.stack([jnp.asarray(s) for s in h])
                      for h in model.subquantizers])
    print(f"[{time.time()-t0:.0f}s] encoding {args.n}", file=sys.stderr,
          flush=True)
    from columbiaimagesearch_tpu.utils.chunking import round_up

    # Encode in streamed slabs (same HBM reasoning as ground truth);
    # streaming chunks go device-synth -> encode, only codes come home.
    co_parts, fi_parts = [], []
    for c in range((args.n + CH - 1) // CH):
        if X is None:
            n_real = min(CH, args.n - c * CH)
            xd = _synth_dev(jnp.int32(c))    # device; CH is 4096-aligned
        else:
            xc = X[c * CH:(c + 1) * CH]
            n_real = len(xc)
            pad = round_up(n_real, 4096) - n_real
            if pad:
                xc = np.pad(xc, [(0, pad), (0, 0)])
            xd = jnp.asarray(xc)
        co, fi = lopq_encode(Cs, Rs, mus, subs, xd, chunk=4096)
        co_parts.append(np.asarray(co)[:n_real])
        fi_parts.append(np.asarray(fi)[:n_real])
        if c % 8 == 7:
            print(f"[{time.time()-t0:.0f}s] encoded "
                  f"{min((c + 1) * CH, args.n)}/{args.n}",
                  file=sys.stderr, flush=True)
    coarse = np.concatenate(co_parts)[:args.n]
    fine = np.concatenate(fi_parts)[:args.n].astype(np.uint8)

    runs = []

    def recall(search_fn, label, extra=None):
        hits = {1: 0, 10: 0, 100: 0}
        t_q = time.perf_counter()
        for qi, q in enumerate(queries):
            ids = search_fn(q)
            for k in hits:
                if nns[qi] in ids[:k]:
                    hits[k] += 1
        dt = (time.perf_counter() - t_q) / len(queries)
        out = {f"recall@{k}": hits[k] / len(queries) for k in hits}
        row = {"method": label, **out,
               "ms_per_query_e2e_host": round(dt * 1e3, 2), **(extra or {})}
        runs.append(row)
        print(json.dumps(row))
        return out

    # Probed searcher at production quota, over the probe-width sweep
    # (0 = adaptive escalation ladder, the serving default).
    widths = ([int(w) for w in args.probe_widths.split(",")]
              if args.probe_widths else [args.probe_width or 0])
    quotas = ([int(q) for q in args.quotas.split(",")]
              if args.quotas else [args.quota])
    print(f"[{time.time()-t0:.0f}s] packing index ({args.n} codes)",
          file=sys.stderr, flush=True)
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine))  # default ids = row index (no 100M list)
    for quota in quotas:
        for w in widths:
            s.probe_width = w or None
            label_w = "adaptive" if not w else str(w)
            print(f"[{time.time()-t0:.0f}s] probed search B={label_w} "
                  f"quota={quota}", file=sys.stderr, flush=True)
            # One batched wave per sweep (the serving path): at 100M with
            # 6 sweeps the per-query loop paid 600 sequential dispatches
            # + relay syncs; search_batch runs each sweep as one device
            # wave with host-side escalation. The first wave is a warm-up
            # (uncounted): it pays the remote rung-program compiles
            # (30-300 s each through the relay) and, for the adaptive
            # ladder, settles the tier hint at this sweep's rung — the
            # steady state a serving process sits in. Timing the cold
            # wave made the r05 first-cut adaptive numbers (1.3 s/query
            # at 4M) pure compile time, 20x off the warm cost.
            # Warm until the wave time stabilizes (<=5 waves): one warm
            # wave is NOT enough for the adaptive ladder — it settles
            # the tier hint and yield EMA, so the NEXT wave's partial
            # escalations run at smaller wave buckets (fewer escaping
            # queries -> jnp.take + pad to a smaller bucket = a fresh
            # jit key) and paid a mid-wave relay compile: the r05 4M
            # artifact's adaptive@10k read 553 ms/query (~one 55 s
            # compile across 100 queries) while adaptive@100k read a
            # true 66 ms.
            prev = None
            for _ in range(5):
                t_w = time.perf_counter()
                s.search_batch(np.asarray(queries), quota=quota,
                               limit=100, with_codes=False)
                dt_w = time.perf_counter() - t_w
                if prev is not None and 0.7 * prev < dt_w < 1.5 * prev:
                    break
                prev = dt_w
            t_q = time.perf_counter()
            outs = s.search_batch(np.asarray(queries), quota=quota,
                                  limit=100, with_codes=False)
            dt = (time.perf_counter() - t_q) / len(queries)
            hits = {1: 0, 10: 0, 100: 0}
            for qi, (res, _visited) in enumerate(outs):
                ids = [r.id for r in res]
                for k in hits:
                    if nns[qi] in ids[:k]:
                        hits[k] += 1
            row = {"method": f"probed_quota{quota}",
                   **{f"recall@{k}": hits[k] / len(queries)
                      for k in hits},
                   "ms_per_query_e2e_host": round(dt * 1e3, 2),
                   "batched": True, "probe_width": label_w}
            runs.append(row)
            print(json.dumps(row))

    # Probed + exact-feature rerank (the production configuration:
    # reference searcher_lopqhbase reranking path).
    if not args.skip_rerank and not args.stream_synth:
        # THE production configuration (reference rerank path,
        # searcher_lopqhbase.py:862-912 with conf_search_sbpycaffe_release
        # .json:16 reranking on): adaptive ladder + device-resident
        # feature store, exact top-1000 rerank fused into the query
        # launch. Re-index with feats resident (the eval model has no
        # PCA, so index space == input space and feats is X itself);
        # warm wave first, same methodology as the sweeps above.
        print(f"[{time.time()-t0:.0f}s] probed + fused device rerank "
              f"(re-packing with resident feature store)",
              file=sys.stderr, flush=True)
        del s
        s = LOPQSearcherTPU(model, rerank_dtype=args.rerank_dtype)
        s.add_codes((coarse, fine), feats=X)
        qarr = np.asarray(queries)
        # Stabilized warm-up (see the sweep loop above for why one warm
        # wave is not enough for the adaptive ladder).
        prev = None
        for _ in range(5):
            t_w = time.perf_counter()
            s.search_batch(qarr, quota=args.quota, limit=100,
                           with_codes=False, rerank_nb=1000)
            dt_w = time.perf_counter() - t_w
            if prev is not None and 0.7 * prev < dt_w < 1.5 * prev:
                break
            prev = dt_w
        t_q = time.perf_counter()
        outs = s.search_batch(qarr, quota=args.quota, limit=100,
                              with_codes=False, rerank_nb=1000)
        dt = (time.perf_counter() - t_q) / len(queries)
        hits = {1: 0, 10: 0, 100: 0}
        for qi, (res, _visited) in enumerate(outs):
            ids = [r.id for r in res]
            for k in hits:
                if nns[qi] in ids[:k]:
                    hits[k] += 1
        row = {"method": f"probed_quota{args.quota}_rerank1000",
               **{f"recall@{k}": hits[k] / len(queries) for k in hits},
               "ms_per_query_e2e_host": round(dt * 1e3, 2),
               "batched": True, "probe_width": "adaptive",
               "rerank": "fused_device",
               "rerank_dtype": args.rerank_dtype}
        runs.append(row)
        print(json.dumps(row))

    if not args.skip_exact and not args.stream_synth:
        from columbiaimagesearch_tpu.index.pallas_adc import ExhaustiveADC

        print(f"[{time.time()-t0:.0f}s] exhaustive exact search",
              file=sys.stderr, flush=True)
        ex = ExhaustiveADC(model)
        ex.build(coarse, fine, ids=list(range(args.n)))
        recall(lambda q: ex.search(q, k=100)[0], "exhaustive_exact")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "config": {"n": args.n, "dim": args.dim, "V": args.V,
                           "M": args.M, "query_noise": args.query_noise,
                           "queries": args.queries, "quota": args.quota,
                           "stream_synth": bool(args.stream_synth)},
                "runs": runs,
            }, f, indent=1)
        print(f"[{time.time()-t0:.0f}s] wrote {args.out}", file=sys.stderr,
              flush=True)

    print(f"[{time.time()-t0:.0f}s] done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
