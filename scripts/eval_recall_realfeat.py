#!/usr/bin/env python
"""Recall on a REALISTIC feature distribution: the actual extraction
pipeline end-to-end.

The synthetic-cluster recall harness (scripts/eval_recall.py) measures the
index on gaussian mixtures; production serves CNN activations — sparse,
non-negative, anisotropic. This script runs the real pipeline: procedurally
structured images are synthesized ON DEVICE (gratings + blobs + colored
noise — varied enough to drive real conv structure), fc7 features come from
the Sentibank topology with RANDOMLY INITIALIZED weights (init_params(0) —
the pretrained caffemodel is unreachable offline, documented in
docs/PARITY.md; the converter itself is torch-twin validated separately in
tests/test_sentibank_weights.py but is NOT exercised here), a lopq_pca
model is
fit exactly like the release config's shape (pca 256, M=8, subq 256;
reference: conf/conf_search_sbpycaffe_release.json:9-15), the features are
indexed, and recall@{1,10,100} of the probed searcher (default adaptive
probe), probed+rerank (device PCA-space and host raw-space), is measured
against brute-force ground truth in the RAW normalized feature space — the
reference's eval method (reference: lopq/lopq/eval.py:92-142).

Usage: python scripts/eval_recall_realfeat.py --n 200000 --queries 100
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--train-n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--V", type=int, default=1024)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--pca-dims", type=int, default=256)
    ap.add_argument("--quota", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests while the "
                         "one TPU chip is busy; config.update is the only "
                         "override that beats this box's sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from columbiaimagesearch_tpu.models.preprocess import (
        default_mean_image,
        preprocess_device,
    )
    from columbiaimagesearch_tpu.models.sentibank import (
        init_params,
        sentibank_features,
    )

    t0 = time.time()
    log(f"devices: {jax.devices()}")

    # ---- device-side procedural image synthesis --------------------------
    # Shared renderer (columbiaimagesearch_tpu/utils/synthimg.py): the
    # serving bench's --realfeat mode indexes the same distribution, so
    # recall and serving artifacts are comparable.
    from columbiaimagesearch_tpu.utils.synthimg import make_render_batch

    params = init_params(0)
    mean = jnp.asarray(default_mean_image())

    # Two separate programs (see make_render_batch): fusing the vmapped
    # synthesis into the conv net produced one enormous HLO whose remote
    # compile never returned (>18 min); split, each compiles in seconds.
    synth_batch = make_render_batch(args.batch)

    @jax.jit
    def extract_batch(imgs, params, mean):
        x = preprocess_device(imgs, mean)
        f = sentibank_features(params, x)
        # featsio convention: L2-normalize before store (featsio.py:13-22)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-30)

    key = jax.random.PRNGKey(0)
    feats_parts = []
    done = 0
    while done < args.n + args.queries:
        key, k = jax.random.split(key)
        feats_parts.append(
            np.asarray(extract_batch(synth_batch(k), params, mean)))
        done += args.batch
        if done % (args.batch * 32) == 0:
            log(f"[{time.time()-t0:.0f}s] extracted {done}")
    F = np.concatenate(feats_parts)
    X, Q = F[:args.n], F[args.n:args.n + args.queries]
    log(f"[{time.time()-t0:.0f}s] features: X {X.shape} "
        f"(sparsity {float((X == 0).mean()):.2f}) queries {Q.shape}")

    # ---- ground truth in RAW normalized feature space --------------------
    qd = jnp.asarray(Q)

    @jax.jit
    def chunk_nn(qd, Xc):
        d = (jnp.sum(Xc * Xc, 1)[None, :]
             - 2.0 * jnp.dot(qd, Xc.T, preferred_element_type=jnp.float32,
                             precision="highest"))
        k = min(128, Xc.shape[0])
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx

    gt_chunk = 1 << 18
    best_d = np.full((len(Q), 128), np.inf, np.float32)
    best_i = np.zeros((len(Q), 128), np.int64)
    for s0 in range(0, args.n, gt_chunk):
        dd, ii = chunk_nn(qd, jnp.asarray(X[s0:s0 + gt_chunk]))
        dd, ii = np.asarray(dd), np.asarray(ii) + s0
        alld = np.concatenate([best_d, dd], axis=1)
        alli = np.concatenate([best_i, ii], axis=1)
        sel = np.argsort(alld, axis=1, kind="stable")[:, :128]
        best_d = np.take_along_axis(alld, sel, axis=1)
        best_i = np.take_along_axis(alli, sel, axis=1)
    nns = best_i[:, 0]
    log(f"[{time.time()-t0:.0f}s] ground truth done")

    # ---- fit the release-shaped lopq_pca model ---------------------------
    from columbiaimagesearch_tpu.index.model import LOPQModelPCA
    from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

    log(f"[{time.time()-t0:.0f}s] fitting lopq_pca pca{args.pca_dims} "
        f"V={args.V} M={args.M} on {args.train_n}")
    model = LOPQModelPCA(V=args.V, M=args.M, subquantizer_clusters=256)
    model.fit(X[:args.train_n], pca_dims=args.pca_dims, n_init=1,
              random_state=0)

    Xp = model.apply_PCA(X)
    coarse, fine = model.predict_batch(X)
    log(f"[{time.time()-t0:.0f}s] encoded; indexing")
    s = LOPQSearcherTPU(model)
    s.add_codes((coarse, fine), ids=list(range(args.n)), feats=Xp)

    runs = []

    def recall(search_fn, label, extra=None):
        hits = {1: 0, 10: 0, 100: 0}
        for qi, q in enumerate(Q):
            ids = search_fn(q)
            for k in hits:
                if nns[qi] in ids[:k]:
                    hits[k] += 1
        out = {f"recall@{k}": hits[k] / len(Q) for k in hits}
        row = {"method": label, **out, **(extra or {})}
        runs.append(row)
        log(json.dumps(row))

    log(f"[{time.time()-t0:.0f}s] probed search (default adaptive probe)")
    recall(lambda q: [r.id for r in
                      s.search(q, quota=args.quota, limit=100,
                               with_dists=True)[0]],
           f"probed_quota{args.quota}", {"probe": "adaptive"})

    log(f"[{time.time()-t0:.0f}s] probed + DEVICE rerank (PCA space)")
    recall(lambda q: [r.id for r in
                      s.search(q, quota=args.quota, limit=1000,
                               with_dists=True, rerank_nb=1000)[0]][:100],
           f"probed_quota{args.quota}_device_rerank1000",
           {"probe": "adaptive", "rerank_space": "pca"})

    log(f"[{time.time()-t0:.0f}s] probed + HOST rerank (raw space)")

    def probed_rerank_raw(q):
        res, _ = s.search(q, quota=args.quota, limit=1000, with_dists=True)
        cand = np.asarray([r.id for r in res])
        if not len(cand):
            return []
        exact = np.linalg.norm(X[cand] - q[None, :], axis=1)
        return cand[np.argsort(exact, kind="stable")][:100].tolist()

    recall(probed_rerank_raw, f"probed_quota{args.quota}_raw_rerank1000",
           {"probe": "adaptive", "rerank_space": "raw"})

    out = {
        "config": {
            "n": args.n, "queries": args.queries, "V": args.V,
            "M": args.M, "pca_dims": args.pca_dims, "quota": args.quota,
            "feature_source": "sentibank fc7, randomly initialized "
                              "(seed 0) topology — NOT pretrained "
                              "weights (caffemodel unreachable "
                              "offline); device-synthesized "
                              "structured images",
            "gt_space": "raw normalized 4096-d (reference eval.py method)",
        },
        "runs": runs,
    }
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"r03_recall_realfeat_{args.n // 1000}k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"[{time.time()-t0:.0f}s] wrote {path}")


if __name__ == "__main__":
    main()
