"""PR-curve evaluation of the conv-HOG face detector on REAL-IMAGE
composites — no procedural renderer anywhere in the eval data.

The identity-disjoint eval (scripts/eval_face_detector.py, AP 0.70) still
renders both train and eval faces with the same generator
(models/face_synth.py); this script answers "does the template fire on
photographic faces and stay quiet on photographic non-face content?"
with the only real imagery available on this zero-egress box: the
bundled portrait (tests/data/grace_hopper.jpg). NOTE the default shipped
template trains on this portrait's crops (train_face_template.py adds the
bundled annotations unless --synth-only), so with the default template
this measures the training-identity operating point; pass
``--template <synth-only .npz>`` for the held-out-identity number — both
are committed as benchmarks/ artifacts.

Scenes are built entirely from the photograph:
- positives: the real face region pasted (feather-blended) at varied
  scales (window 50..160 px), small rotations, and partial occlusions,
  onto mosaics of real NON-face crops of the same photo;
- negatives: mosaic-only scenes (real fabric/background/insignia
  texture) — any detection there is a false positive.

This is one identity, honestly labeled as such in the artifact — the
gap to dlib's HOG+SVM trained on thousands of photos
(reference: cufacesearch/cufacesearch/detector/dlib_detector.py:10-35)
is documented in docs/PARITY.md.

Usage: python scripts/eval_face_real_composite.py [--cpu]
    [--out benchmarks/r05_face_real_composite_eval.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eval_face_detector import GRACE, GRACE_BBOX, evaluate, iou, pr_curve  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bg_patch(rng, gray, face_keepout, h, w):
    """Random non-face crop of the photo (reflected for variety)."""
    H, W = gray.shape
    for _ in range(100):
        y = rng.randint(0, max(H - h, 1))
        x = rng.randint(0, max(W - w, 1))
        box = (x, y, x + w, y + h)
        if iou(box, face_keepout) < 0.02:
            p = gray[y:y + h, x:x + w].copy()
            if rng.rand() < 0.5:
                p = p[:, ::-1]
            if rng.rand() < 0.5:
                p = p[::-1, :]
            return p
    return gray[:h, :w].copy()


def _mosaic(rng, gray, face_keepout, H=360, W=480, tile=120):
    """Background scene: a grid of real non-face crops."""
    out = np.zeros((H, W), np.float32)
    for y in range(0, H, tile):
        for x in range(0, W, tile):
            h = min(tile, H - y)
            w = min(tile, W - x)
            out[y:y + h, x:x + w] = _bg_patch(rng, gray, face_keepout, h, w)
    return out


def _paste_face(rng, scene, face, size, occlude_frac, gray, face_keepout):
    """Feather-blend the real face into the scene at a random position;
    returns the ground-truth box."""
    from PIL import Image

    H, W = scene.shape
    ang = rng.uniform(-10, 10)
    chip = Image.fromarray(face.astype(np.uint8)).resize(
        (size, size), Image.BILINEAR).rotate(ang, Image.BILINEAR)
    chip = np.asarray(chip, np.float32)
    y = rng.randint(0, H - size)
    x = rng.randint(0, W - size)
    # Feathered alpha so the detector cannot cue on paste borders.
    ramp = np.minimum(np.arange(size) + 1, size - np.arange(size))
    feather = np.minimum(ramp[:, None], ramp[None, :]) / (0.12 * size)
    alpha = np.clip(feather, 0.0, 1.0)
    region = scene[y:y + size, x:x + size]
    scene[y:y + size, x:x + size] = alpha * chip + (1 - alpha) * region
    if occlude_frac > 0:
        oh = int(size * occlude_frac)
        ow = int(size * rng.uniform(0.3, 0.9))
        oy = y + rng.randint(0, size - oh)
        ox = x + rng.randint(0, size - ow)
        scene[oy:oy + oh, ox:ox + ow] = _bg_patch(
            rng, gray, face_keepout, oh, ow)
    return [x, y, x + size, y + size]


def build_scenes(n_pos=30, n_neg=15, seed=0):
    from PIL import Image

    img = np.asarray(Image.open(GRACE).convert("L"), np.float32)
    l, t, r, b = GRACE_BBOX
    # Keep-out with margin so no "background" crop contains face parts.
    m = 40
    keepout = (l - m, t - m, r + m, b + m)
    face = img[t:b, l:r]
    side = min(face.shape)
    face = face[:side, :side]

    rng = np.random.RandomState(seed)
    specs = []
    sizes = [50, 80, 110, 140, 160]
    for i in range(n_pos):
        scene = _mosaic(rng, img, keepout)
        gt = []
        for _ in range(1 + (i % 2)):
            size = sizes[rng.randint(len(sizes))]
            occ = 0.0 if rng.rand() < 0.5 else rng.uniform(0.1, 0.25)
            gt.append(_paste_face(rng, scene, face, size, occ, img,
                                  keepout))
        specs.append((scene.astype(np.uint8), gt))
    for i in range(n_neg):
        specs.append((_mosaic(rng, img, keepout).astype(np.uint8), []))
    return specs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pos-scenes", type=int, default=30)
    ap.add_argument("--neg-scenes", type=int, default=15)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--up-sample", type=int, default=1,
                    help="pyramid up-sampling (1 reaches 50 px faces "
                         "with the 80 px window)")
    ap.add_argument("--template", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from columbiaimagesearch_tpu.models.face_detector import (
        ConvHOGFaceDetector,
    )

    if args.template:
        with np.load(args.template) as z:
            det = ConvHOGFaceDetector(template=z["template"],
                                      bias=float(z["bias"]))
    else:
        det = ConvHOGFaceDetector()

    specs = build_scenes(args.pos_scenes, args.neg_scenes)
    n_faces = sum(len(gt) for _, gt in specs)
    print(f"evaluating on {len(specs)} real-composite scenes "
          f"({n_faces} faces, {args.neg_scenes} negative-only)",
          file=sys.stderr)

    import eval_face_detector as efd

    old_run = ConvHOGFaceDetector.run
    try:
        # evaluate() calls det.run(scene, up_sample=0); re-route the
        # up_sample knob without forking the shared harness.
        ConvHOGFaceDetector.run = (
            lambda self, img, up_sample=0, _old=old_run, _u=args.up_sample:
            _old(self, img, up_sample=_u))
        scores, tp, n_gt = efd.evaluate(det, specs, iou_th=args.iou)
    finally:
        ConvHOGFaceDetector.run = old_run
    recall, precision, th, ap_v = pr_curve(scores, tp, n_gt)

    op_mask = th >= det.threshold
    op_r = float(recall[op_mask][-1]) if op_mask.any() else 0.0
    op_p = float(precision[op_mask][-1]) if op_mask.any() else 1.0

    k = max(1, len(recall) // 64)
    curve = [[round(float(r), 4), round(float(p), 4), round(float(t), 3)]
             for r, p, t in zip(recall[::k], precision[::k], th[::k])]

    result = {
        "metric": "face_detector_real_composite_ap",
        "value": round(ap_v, 4),
        "unit": f"AP@IoU{args.iou} (real-photo composites, no renderer)",
        "vs_baseline": None,
        "extra": {
            "n_scenes": len(specs),
            "n_faces": n_gt,
            "neg_only_scenes": args.neg_scenes,
            "identities": 1,
            # Honesty note: the DEFAULT shipped template trains on this
            # portrait's crops too (train_face_template.py synth mode,
            # portrait_boost) — only a --synth-only template makes this a
            # held-out-identity measurement. Record which one this is.
            "template": args.template or ("shipped default (this "
                                          "portrait's crops ARE in its "
                                          "training set)"),
            "source": "tests/data/grace_hopper.jpg; positives pasted at "
                      "50-160 px with rotation and 0-25% occlusion on "
                      "real non-face mosaics",
            "operating_point": {"threshold": det.threshold,
                                "precision": round(op_p, 4),
                                "recall": round(op_r, 4)},
            "pr_curve_recall_precision_threshold": curve,
        },
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(line + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
