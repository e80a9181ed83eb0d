"""Train the conv-HOG face-detector template from annotated face images.

The reference ships dlib's pretrained HOG+SVM face detector
(reference: cufacesearch/detector/dlib_detector.py:10-35, auto-downloaded
models in featurizer/dlib_featurizer.py:1-47). This environment has no
egress, so the TPU-native detector's linear template is trained here from
annotated photos (jittered positive crops + low-overlap negative crops,
device logistic regression) and persisted to the conventional artifact path
that ConvHOGFaceDetector auto-loads.

Usage:
    python scripts/train_face_template.py \
        [--annotations faces.json] [--out path.npz]

``faces.json``: {"<image path>": [left, top, right, bottom], ...}.
Default: the bundled public-domain Grace Hopper portrait + its annotation.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_ANNOTATIONS = {
    os.path.join(REPO, "tests", "data", "grace_hopper.jpg"):
        [175, 140, 360, 380],
}


def crops_for(img_gray, bbox, rng):
    """Jittered positive crops + low-overlap negative crops for one image."""
    from PIL import Image

    from columbiaimagesearch_tpu.models.face_detector import WINDOW

    H, W = img_gray.shape
    l, t, r, b = bbox

    def crop(x0, y0, x1, y1):
        c = Image.fromarray(img_gray[max(y0, 0):min(y1, H),
                                     max(x0, 0):min(x1, W)])
        return np.asarray(c.resize((WINDOW, WINDOW), Image.BILINEAR),
                          dtype=np.float32)

    pos, neg = [], []
    for dx in (-12, 0, 12):
        for dy in (-12, 0, 12):
            for grow in (-15, 0, 15):
                pos.append(crop(l + dx - grow, t + dy - grow,
                                r + dx + grow, b + dy + grow))
    while len(neg) < 120:
        s = rng.randint(60, max(61, min(H, W) // 2))
        x0 = rng.randint(0, W - s)
        y0 = rng.randint(0, H - s)
        ix = max(0, min(x0 + s, r) - max(x0, l))
        iy = max(0, min(y0 + s, b) - max(y0, t))
        if ix * iy > 0.25 * s * s:
            continue
        neg.append(crop(x0, y0, x0 + s, y0 + s))
    return pos, neg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotations", default=None,
                    help="JSON {image_path: [l, t, r, b]}")
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    from PIL import Image

    from columbiaimagesearch_tpu.models.face_detector import (
        ConvHOGFaceDetector,
    )

    if args.annotations:
        with open(args.annotations) as f:
            annotations = json.load(f)
    else:
        annotations = DEFAULT_ANNOTATIONS

    rng = np.random.RandomState(0)
    pos, neg = [], []
    for path, bbox in annotations.items():
        gray = np.asarray(Image.open(path).convert("RGB"),
                          dtype=np.float32).mean(axis=2)
        p, n = crops_for(gray, bbox, rng)
        pos += p
        neg += n
    print(f"training on {len(pos)} positives / {len(neg)} negatives "
          f"from {len(annotations)} annotated images", file=sys.stderr)

    det = ConvHOGFaceDetector(threshold=0.0)  # train() replaces any template
    det.train(pos, neg, steps=args.steps)
    out = det.save_template(args.out)
    print(f"saved template -> {out}", file=sys.stderr)

    # sanity: the trained template must localize each training face
    for path, bbox in annotations.items():
        img = np.asarray(Image.open(path).convert("RGB"))
        det.threshold = 0.5
        boxes, scores = det.run(img, up_sample=0)
        best = 0.0
        for bx in boxes:
            l, t, r, b = bbox
            xx1, yy1 = max(bx[0], l), max(bx[1], t)
            xx2, yy2 = min(bx[2], r), min(bx[3], b)
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            ua = ((bx[2] - bx[0]) * (bx[3] - bx[1])
                  + (r - l) * (b - t) - inter)
            best = max(best, inter / ua)
        print(f"{os.path.basename(path)}: {len(boxes)} detections, "
              f"best IoU {best:.2f}", file=sys.stderr)
        if best < 0.4:
            raise SystemExit(f"template failed to localize face in {path}")


if __name__ == "__main__":
    main()
