#!/usr/bin/env python
"""Offline index build: feature files -> trained model + persistent codes.

The role of the reference's Spark build-lopq-index workflow (vestigial in
the reference: lopq spark train_model/compute_codes linked from
lopq/lopq/model.py:914-917) as a single-machine TPU job: load features
(.npy/.npz/.fvecs), train LOPQ (or LOPQ+PCA), encode everything on device,
and persist the model (storer) + codes (native codestore) for the searcher.

Usage:
  python scripts/build_index.py --features feats.npy --out ./data \
      --model-type lopq_pca --V 4096 --M 8 --pca-dims 256
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_features(path):
    import numpy as np

    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        d = np.load(path)
        return d[list(d.keys())[0]]
    if path.endswith(".fvecs"):
        from columbiaimagesearch_tpu.utils.xvecs import load_xvecs

        return load_xvecs(path, "f")
    raise ValueError(f"unsupported feature file {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", required=True)
    ap.add_argument("--ids", help="optional .txt with one id per row")
    ap.add_argument("--out", default="./data")
    ap.add_argument("--model-type", choices=["lopq", "lopq_pca"],
                    default="lopq")
    ap.add_argument("--V", type=int, default=256)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--subq", type=int, default=256)
    ap.add_argument("--pca-dims", type=int, default=256)
    ap.add_argument("--nb-train", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from columbiaimagesearch_tpu.index.model import LOPQModel, LOPQModelPCA
    from columbiaimagesearch_tpu.native import CodeStore
    from columbiaimagesearch_tpu.store.storer import LocalStorer

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    X = np.asarray(load_features(args.features), dtype=np.float32)
    ids = (open(args.ids).read().split() if args.ids
           else [str(i) for i in range(len(X))])
    print(f"[{time.time()-t0:.1f}s] {X.shape[0]} features dim {X.shape[1]}")

    train = X[: args.nb_train]
    if args.model_type == "lopq":
        model = LOPQModel(V=args.V, M=args.M,
                          subquantizer_clusters=args.subq)
        model.fit(train, n_init=1, random_state=args.seed)
    else:
        model = LOPQModelPCA(V=args.V, M=args.M,
                             subquantizer_clusters=args.subq)
        model.fit(train, pca_dims=args.pca_dims, n_init=1,
                  random_state=args.seed)
    print(f"[{time.time()-t0:.1f}s] trained {args.model_type}")

    storer = LocalStorer(os.path.join(args.out, "storer"))
    model_str = f"offline_{args.model_type}-V{args.V}-M{args.M}"
    storer.save(model_str, model)

    coarse, fine = model.predict_batch(X)
    cells = coarse[:, 0].astype(np.uint32) * args.V + coarse[:, 1]
    cs = CodeStore(os.path.join(args.out, f"{model_str}.codes"), m=args.M)
    cs.append(cells, fine.astype(np.uint8), ids)
    cs.sync()
    cs.close()
    print(f"[{time.time()-t0:.1f}s] encoded + persisted {len(X)} codes "
          f"-> {args.out}/{model_str}.codes")


if __name__ == "__main__":
    main()
