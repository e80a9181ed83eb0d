"""Real-photo sanity for the face pipeline (no network access).

The reference's face stack is dlib's pretrained detector + embedder
exercised on live URLs (reference: detector/dlib_detector.py:10-35,
featurizer/dlib_featurizer.py:50-105, tests/test_dlibfacedetect.py). With
no egress, the shipped artifact is a template trained on the bundled
public-domain portrait (scripts/train_face_template.py); these tests assert
the shipped detector finds the real face, aligned chips are stable, and
embeddings behave metrically (same-face crops closer than non-face crops).
"""

import os

import numpy as np
import pytest
from PIL import Image

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
HOPPER_BBOX = (175, 140, 360, 380)  # hand annotation, see data/README.md


def _iou(a, b):
    xx1, yy1 = max(a[0], b[0]), max(a[1], b[1])
    xx2, yy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua


@pytest.fixture(scope="module")
def hopper():
    return np.asarray(Image.open(
        os.path.join(DATA, "grace_hopper.jpg")).convert("RGB"))


def test_shipped_template_detects_real_face(hopper):
    """A default-constructed detector (shipped artifact auto-loaded) must
    localize the real face."""
    from columbiaimagesearch_tpu.models.face_detector import (
        ConvHOGFaceDetector,
    )

    det = ConvHOGFaceDetector()
    assert det._load_default() is not None, (
        "face_template.npz artifact missing - run "
        "scripts/train_face_template.py")
    dets = det.detect_from_img(hopper, up_sample=0)
    assert dets, "no face detected in the real photo"
    best = max(_iou((d["left"], d["top"], d["right"], d["bottom"]),
                    HOPPER_BBOX) for d in dets)
    assert best >= 0.4, f"best IoU {best:.2f} vs annotation"


def test_face_pipeline_on_real_photo(hopper):
    """detect -> align/crop -> embed on the real photo; embeddings are
    finite, unit-scale-ish, and deterministic."""
    from columbiaimagesearch_tpu.extraction.detector import get_detector
    from columbiaimagesearch_tpu.extraction.extractor import get_featurizer

    det = get_detector("face")
    bboxes = det.detect_from_img(hopper)
    assert bboxes, "pipeline detector found no face"
    feat = get_featurizer("face")
    embs = np.asarray(feat.featurize_batch(hopper, bboxes))
    assert embs.shape[1] == 128 and np.isfinite(embs).all()
    embs2 = np.asarray(feat.featurize_batch(hopper, bboxes))
    np.testing.assert_array_equal(embs, embs2)


def test_same_face_crops_closer_than_background(hopper):
    """Metric sanity: two jittered crops of the same real face embed closer
    together than the face does to non-face crops of the same photo."""
    from columbiaimagesearch_tpu.extraction.extractor import get_featurizer

    l, t, r, b = HOPPER_BBOX
    feat = get_featurizer("face")

    def emb(bbox):
        e = np.asarray(feat.featurize_batch(
            hopper, [{"left": bbox[0], "top": bbox[1], "right": bbox[2],
                      "bottom": bbox[3], "score": 1.0}]))[0]
        return e / (np.linalg.norm(e) + 1e-30)

    face_a = emb((l, t, r, b))
    face_b = emb((l + 10, t + 8, r + 10, b + 8))      # jittered same face
    bg_flag = emb((0, 0, 150, 320))                    # flag region
    bg_uniform = emb((150, 420, 360, 595))             # uniform/medals

    d_same = np.linalg.norm(face_a - face_b)
    d_bg = min(np.linalg.norm(face_a - bg_flag),
               np.linalg.norm(face_a - bg_uniform))
    assert d_same < d_bg, (d_same, d_bg)


def test_face_weights_persistence_and_autoload(tmp_path, monkeypatch, hopper):
    """Weight path for the face embedder: npz round trip + auto-load from
    the conventional path (the dlib model auto-download role,
    featurizer/dlib_featurizer.py:1-47)."""
    from columbiaimagesearch_tpu.models.face import (
        FaceEmbedder,
        init_params,
        load_weights_npz,
        save_weights_npz,
    )

    params = init_params(7)
    path = str(tmp_path / "face.npz")
    save_weights_npz(params, path)
    loaded = load_weights_npz(path)

    bbox = {"left": 175, "top": 140, "right": 360, "bottom": 380,
            "score": 1.0}
    a = FaceEmbedder(params=params).featurize(hopper, bbox)
    b = FaceEmbedder(params=loaded).featurize(hopper, bbox)
    np.testing.assert_array_equal(a, b)

    monkeypatch.setenv("FACE_WEIGHTS", path)
    emb = FaceEmbedder()
    assert emb.pretrained
    np.testing.assert_array_equal(emb.featurize(hopper, bbox), a)

    monkeypatch.setenv("FACE_WEIGHTS", str(tmp_path / "missing.npz"))
    assert not FaceEmbedder().pretrained


def test_aligned_embedding_path_on_real_photo(hopper):
    """FaceEmbedder(aligner=...) produces stable 150x150 aligned chips and
    embeddings on the real photo (the reference's dlib get_face_chip
    alignment role, featurizer/dlib_featurizer.py:86-105)."""
    from columbiaimagesearch_tpu.models.face import CHIP_SIZE, FaceEmbedder
    from columbiaimagesearch_tpu.models.face_align import FaceAligner

    aligner = FaceAligner()
    bbox = {"left": 175, "top": 140, "right": 360, "bottom": 380,
            "score": 1.0}
    chips = aligner.align(hopper, [bbox])
    assert chips.shape == (1, CHIP_SIZE, CHIP_SIZE, 3)
    assert np.isfinite(chips).all() and chips.std() > 1.0  # real content

    emb = FaceEmbedder(aligner=aligner)
    e1 = emb.featurize(hopper, bbox)
    assert e1.shape == (128,) and np.isfinite(e1).all()
    # Small bbox jitter -> the aligned chip (hence embedding) stays close
    # relative to a non-face region.
    e2 = emb.featurize(hopper, {**bbox, "left": 183, "top": 147,
                                "right": 368, "bottom": 387})
    bg = emb.featurize(hopper, {"left": 0, "top": 0, "right": 150,
                                "bottom": 320, "score": 1.0})
    n = lambda v: v / (np.linalg.norm(v) + 1e-30)  # noqa: E731
    assert np.linalg.norm(n(e1) - n(e2)) < np.linalg.norm(n(e1) - n(bg))


# ---------------------------------------------------------------------------
# Held-out generalization (round 3). True cross-identity validation needs
# face photos this zero-egress environment does not have (the repo bundles
# exactly one portrait; the reference leaned on dlib's pretrained detector,
# detector/dlib_detector.py:10-35). What CAN be validated offline is that
# the shipped template is not a pixel memorizer: it must localize the face
# under transforms OUTSIDE the training-jitter family (train-time
# augmentation is +-12 px shifts / +-15 px scale growth ONLY —
# scripts/train_face_template.py crops_for), and must stay silent on
# face-free images.
# ---------------------------------------------------------------------------


def _best_iou(det, img, bb, up=0):
    ds = det.detect_from_img(img, up_sample=up)
    if not ds:
        return 0.0
    return max(_iou((d["left"], d["top"], d["right"], d["bottom"]), bb)
               for d in ds)


@pytest.fixture(scope="module")
def shipped_detector():
    from columbiaimagesearch_tpu.models.face_detector import (
        ConvHOGFaceDetector,
    )

    det = ConvHOGFaceDetector()
    assert det._load_default() is not None
    return det


def test_detector_heldout_scale(hopper, shipped_detector):
    """0.6x and 1.4x image scales — far outside the +-15 px training
    growth; the multi-scale pyramid must still localize."""
    pil = Image.fromarray(hopper)
    W, H = pil.size
    for s in (0.6, 1.4):
        img2 = np.asarray(pil.resize((int(W * s), int(H * s)),
                                     Image.BILINEAR))
        bb2 = tuple(int(v * s) for v in HOPPER_BBOX)
        got = _best_iou(shipped_detector, img2, bb2, up=1 if s < 1 else 0)
        assert got >= 0.5, f"scale {s}: IoU {got:.2f}"


def test_detector_heldout_rotation_flip_gamma(hopper, shipped_detector):
    """In-plane rotations, mirror, and strong gamma shifts — none of these
    appear in the training crops."""
    pil = Image.fromarray(hopper)
    W, _H = pil.size
    for ang in (-8, 8):
        img2 = np.asarray(pil.rotate(ang, resample=Image.BILINEAR))
        got = _best_iou(shipped_detector, img2, HOPPER_BBOX)
        assert got >= 0.5, f"rot {ang}: IoU {got:.2f}"
    l, t, r, b = HOPPER_BBOX
    got = _best_iou(shipped_detector, hopper[:, ::-1],
                    (W - r, t, W - l, b))
    assert got >= 0.5, f"flip: IoU {got:.2f}"
    for g in (0.6, 1.5):
        img2 = (255.0 * (hopper / 255.0) ** g).astype(np.uint8)
        got = _best_iou(shipped_detector, img2, HOPPER_BBOX)
        assert got >= 0.5, f"gamma {g}: IoU {got:.2f}"


def test_detector_heldout_composite_scene(hopper, shipped_detector):
    """The portrait pasted into a large cluttered scene at an unseen
    position: the detector must find the face there, not just in the
    original frame."""
    rng = np.random.RandomState(0)
    H, W = hopper.shape[:2]
    scene = rng.randint(0, 255, (900, 1200, 3), dtype=np.uint8)
    ox, oy = 500, 300
    scene[oy:oy + H, ox:ox + W] = hopper
    l, t, r, b = HOPPER_BBOX
    got = _best_iou(shipped_detector, scene,
                    (l + ox, t + oy, r + ox, b + oy))
    assert got >= 0.5, f"composite: IoU {got:.2f}"


def test_detector_negatives_no_face(shipped_detector):
    """Face-free images must produce ZERO detections at the shipped
    threshold: uniform noise, gradients, checkerboard (high-frequency
    structure that fools naive edge templates)."""
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:480, 0:640]
    negatives = {
        "noise": rng.randint(0, 255, (480, 640, 3), dtype=np.uint8),
        "gradient": np.stack([((xx + yy) % 256)] * 3, -1).astype(np.uint8),
        "checker": np.stack(
            [(((yy // 16 + xx // 16) % 2) * 255).astype(np.uint8)] * 3, -1),
        "flat": np.full((300, 400, 3), 128, np.uint8),
    }
    for name, img in negatives.items():
        ds = shipped_detector.detect_from_img(img, up_sample=0)
        assert not ds, f"negative '{name}' produced {len(ds)} detections"


def test_detector_negatives_real_photos(shipped_detector):
    """Face-free REAL photographs (natural texture statistics, unlike the
    synthetic negatives above): outdoor scenes from the pygame docs and
    sklearn's sample images. None ship a face; the shipped threshold must
    produce zero detections on all of them."""
    import glob
    import os

    candidates = []
    for pat in (
        "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated"
        "/_images/camera_rgb.jpg",
        "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated"
        "/_images/intro_freedom.jpg",
        "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images"
        "/china.jpg",
        "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images"
        "/flower.jpg",
    ):
        candidates.extend(glob.glob(pat))
    if not candidates:
        pytest.skip("no bundled sample photos on this system")
    for path in candidates:
        img = np.asarray(Image.open(path).convert("RGB"))
        ds = shipped_detector.detect_from_img(img, up_sample=0)
        assert not ds, (f"real-photo negative {os.path.basename(path)} "
                        f"produced {len(ds)} detections")
