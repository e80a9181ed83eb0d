"""Landmark regression, similarity estimation, and batched warping."""

import numpy as np
import pytest

from columbiaimagesearch_tpu.models.face import FaceEmbedder
from columbiaimagesearch_tpu.models.face_align import (
    CANONICAL_POINTS,
    CHIP_SIZE,
    LM_INPUT,
    FaceAligner,
    estimate_similarity,
    init_landmark_params,
    predict_landmarks,
    train_landmark_net,
    warp_affine,
)


def synth_face_crop(rng, jitter=0.04):
    """64x64 grayscale 'face' with eyes/nose/mouth at known positions."""
    pts = np.array([[0.30, 0.35], [0.70, 0.35], [0.50, 0.55],
                    [0.35, 0.75], [0.65, 0.75]])
    pts = pts + jitter * rng.randn(5, 2)
    img = 90 + 10 * rng.rand(LM_INPUT, LM_INPUT)
    for px, py in pts:
        x, y = int(px * LM_INPUT), int(py * LM_INPUT)
        img[max(0, y - 2):y + 3, max(0, x - 2):x + 3] = 230
    return img.astype(np.float32), pts.astype(np.float32)


def test_estimate_similarity_recovers_transform():
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2) * 100
    theta, s = 0.3, 1.7
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    t = np.array([12.0, -5.0])
    dst = s * src @ R.T + t
    A = estimate_similarity(src, dst)
    got = src @ A[:, :2].T + A[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-4)


def test_warp_affine_identity_and_shift():
    rng = np.random.RandomState(1)
    img = rng.rand(1, 40, 40, 3).astype(np.float32)
    eye = np.zeros((1, 2, 3), np.float32)
    eye[0, 0, 0] = eye[0, 1, 1] = 1.0
    out = np.asarray(warp_affine(img, eye, 40, 40))
    np.testing.assert_allclose(out[0, :39, :39], img[0, :39, :39], atol=1e-5)
    # integer shift by (3, 2): output(x, y) = input(x+3, y+2)
    A = eye.copy()
    A[0, 0, 2] = 3.0
    A[0, 1, 2] = 2.0
    out = np.asarray(warp_affine(img, A, 40, 40))
    np.testing.assert_allclose(out[0, :30, :30], img[0, 2:32, 3:33],
                               atol=1e-5)


def test_landmark_net_trains():
    rng = np.random.RandomState(2)
    data = [synth_face_crop(rng) for _ in range(400)]
    crops = np.stack([d[0] for d in data])[..., None] / 255.0
    points = np.stack([d[1] for d in data])
    params = init_landmark_params(0)
    params, loss = train_landmark_net(params, crops, points, steps=300)
    assert loss < 2e-3
    # held-out
    test = [synth_face_crop(rng) for _ in range(20)]
    tc = np.stack([d[0] for d in test])[..., None] / 255.0
    tp = np.stack([d[1] for d in test])
    pred = np.asarray(predict_landmarks(params, tc))
    err = np.abs(pred - tp).mean()
    assert err < 0.05  # within 5% of crop size


def test_aligner_produces_canonical_chips():
    rng = np.random.RandomState(3)
    # Train a landmark net on the synthetic pattern.
    data = [synth_face_crop(rng) for _ in range(300)]
    crops = np.stack([d[0] for d in data])[..., None] / 255.0
    points = np.stack([d[1] for d in data])
    params, _ = train_landmark_net(init_landmark_params(0), crops, points,
                                   steps=300)
    aligner = FaceAligner(params=params)

    # Scene with the synthetic face embedded at a known bbox.
    crop, pts = synth_face_crop(rng, jitter=0.0)
    scene = (60 * np.ones((200, 260), np.float32))
    from PIL import Image

    face100 = np.asarray(Image.fromarray(crop.astype(np.uint8)).resize(
        (100, 100), Image.BILINEAR))
    scene[40:140, 80:180] = face100
    bbox = {"left": 80, "top": 40, "right": 180, "bottom": 140, "score": 1.0}
    chips = aligner.align(scene, [bbox])
    assert chips.shape == (1, CHIP_SIZE, CHIP_SIZE, 3)
    # The warped eye positions should land near the canonical template:
    # bright (230) pixels near each canonical point.
    chip = chips[0].mean(axis=2)
    for cx, cy in CANONICAL_POINTS[:2]:  # both eyes
        win = chip[int(cy) - 8:int(cy) + 8, int(cx) - 8:int(cx) + 8]
        assert win.max() > 150, f"no bright landmark near ({cx},{cy})"

    # FaceEmbedder integration
    emb = FaceEmbedder(seed=0, aligner=aligner)
    feat = emb.featurize(scene, bbox)
    assert feat.shape == (128,) and feat.dtype == np.float64
