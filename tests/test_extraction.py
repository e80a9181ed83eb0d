"""imgio, featsio, face models and the extraction layer."""

import io

import numpy as np
import pytest

from columbiaimagesearch_tpu.extraction import (
    GenericExtractor,
    build_extr_str,
    featB64decode,
    get_bbox_str,
    get_feat_dtype,
    normfeatB64encode,
)
from columbiaimagesearch_tpu.imgio import (
    buffer_to_B64,
    get_buffer_from_B64,
    get_SHA1_img_info_from_buffer,
    load_image_from_buffer,
)
from columbiaimagesearch_tpu.models.face import FaceEmbedder, extract_chip
from columbiaimagesearch_tpu.models.face_detector import (
    WINDOW,
    ConvHOGFaceDetector,
)


def png_buffer(rng, w=64, h=48):
    from PIL import Image

    img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    buf.seek(0)
    return buf, img


def test_imgio_sha1_info_and_roundtrip():
    rng = np.random.RandomState(0)
    buf, img = png_buffer(rng)
    sha1, img_type, w, h = get_SHA1_img_info_from_buffer(buf)
    assert img_type == "PNG" and (w, h) == (64, 48)
    assert len(sha1) == 40 and sha1 == sha1.upper()
    loaded = load_image_from_buffer(buf)
    np.testing.assert_array_equal(loaded, img)
    # b64 round trip preserves sha1
    b64 = buffer_to_B64(buf)
    sha2, _, _, _ = get_SHA1_img_info_from_buffer(get_buffer_from_B64(b64))
    assert sha2 == sha1


def test_featsio_roundtrip_and_dtypes():
    rng = np.random.RandomState(1)
    feat = rng.randn(128).astype(np.float64)
    enc = normfeatB64encode(feat)
    dec = featB64decode(enc, "dlib")
    assert dec.dtype == np.float64
    np.testing.assert_allclose(np.linalg.norm(dec), 1.0, rtol=1e-6)
    np.testing.assert_allclose(dec, feat / np.linalg.norm(feat))
    assert get_feat_dtype("sbpycaffe") == np.float32
    with pytest.raises(ValueError):
        get_feat_dtype("nope")


def face_like(rng, size=WINDOW):
    """Synthetic 'face': bright oval on dark background + noise."""
    y, x = np.mgrid[0:size, 0:size]
    cy, cx = size / 2, size / 2
    oval = (((y - cy) / (0.42 * size)) ** 2
            + ((x - cx) / (0.33 * size)) ** 2) < 1.0
    img = 30 + 20 * rng.rand(size, size)
    img[oval] = 200 + 20 * rng.rand(oval.sum())
    # eyes
    ey, ex = int(0.38 * size), int(0.33 * size)
    img[ey - 3:ey + 3, ex - 3:ex + 3] = 20
    img[ey - 3:ey + 3, size - ex - 3:size - ex + 3] = 20
    return img.astype(np.float32)


def neg_patch(rng, size=WINDOW):
    return (rng.rand(size, size) * 255).astype(np.float32)


@pytest.fixture(scope="module")
def trained_detector():
    rng = np.random.RandomState(2)
    pos = [face_like(rng) for _ in range(40)]
    neg = [neg_patch(rng) for _ in range(60)]
    det = ConvHOGFaceDetector(threshold=0.0)
    det.train(pos, neg, steps=200)
    return det, rng


def test_detector_trains_and_separates(trained_detector):
    det, rng = trained_detector
    from columbiaimagesearch_tpu.models.face_detector import (
        hog_features,
        score_map,
    )
    import jax.numpy as jnp

    def score(im):
        f = hog_features(jnp.asarray(im))
        return float(np.asarray(
            score_map(f, det.template, jnp.float32(det.bias)))[0, 0])

    pos_scores = [score(face_like(rng)) for _ in range(10)]
    neg_scores = [score(neg_patch(rng)) for _ in range(10)]
    assert min(pos_scores) > max(neg_scores)


def test_detector_localizes_in_scene(trained_detector):
    det, rng = trained_detector
    scene = 40 + 10 * rng.rand(200, 260).astype(np.float32)
    fy, fx = 60, 120
    scene[fy:fy + WINDOW, fx:fx + WINDOW] = face_like(rng)
    dets = det.detect_from_img(scene, up_sample=0)
    assert len(dets) >= 1
    best = max(dets, key=lambda d: d["score"])
    # Center of the best detection must be inside the planted face.
    cx = (best["left"] + best["right"]) / 2
    cy = (best["top"] + best["bottom"]) / 2
    assert fx <= cx <= fx + WINDOW and fy <= cy <= fy + WINDOW
    assert set(best) == {"left", "top", "right", "bottom", "score"}


def test_face_embedder_contract():
    rng = np.random.RandomState(3)
    emb = FaceEmbedder(seed=0)
    img = rng.randint(0, 255, (120, 100, 3), dtype=np.uint8)
    bbox = {"left": 10, "top": 10, "right": 90, "bottom": 100, "score": 1.0}
    feat = emb.featurize(img, bbox)
    assert feat.shape == (128,) and feat.dtype == np.float64
    # batched path consistent
    feats = emb.featurize_batch(img, [bbox, bbox])
    np.testing.assert_allclose(feats[0], feats[1])
    np.testing.assert_allclose(feats[0], feat, rtol=1e-5, atol=1e-5)
    # chip extraction clamps out-of-image boxes
    chip = extract_chip(img, {"left": -20, "top": -20, "right": 500,
                              "bottom": 500})
    assert chip.shape == (150, 150, 3)


def test_extractor_full_image_columns():
    rng = np.random.RandomState(4)
    buf, _ = png_buffer(rng, 120, 90)
    ex = GenericExtractor("full", "sentibank")
    out = ex.process_buffer(buf)
    assert build_extr_str("sentibank", "full", "image") == "sentibank_feat_full_image"
    key = "ext:sentibank_feat_full_image"
    assert out["ext:sentibank_feat_full_image_processed"] == "1"
    feat = featB64decode(out[key], "sentibank")
    assert feat.shape == (4096,)
    np.testing.assert_allclose(np.linalg.norm(feat), 1.0, rtol=1e-5)


def test_extractor_failed_image():
    ex = GenericExtractor("full", "sentibank")
    out = ex.process_buffer(io.BytesIO(b"not an image"))
    assert out == {"ext:sentibank_feat_full_image_failed": "1"}


def test_extractor_face_columns(trained_detector):
    det, rng = trained_detector
    from columbiaimagesearch_tpu.extraction.detector import FaceDetector
    from PIL import Image

    scene = (40 + 10 * rng.rand(200, 260)).astype(np.uint8)
    scene[50:50 + WINDOW, 100:100 + WINDOW] = face_like(rng).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(np.stack([scene] * 3, axis=-1)).save(buf, format="PNG")
    ex = GenericExtractor("face", "face", detector=FaceDetector(det))
    out = ex.process_buffer(buf)
    assert out["ext:face_feat_face_image_processed"] == "1"
    feat_cols = [k for k in out if k.startswith("ext:face_feat_face_image_")
                 and not k.endswith("_processed")]
    assert feat_cols
    feat = featB64decode(out[feat_cols[0]], "face")
    assert feat.shape == (128,) and feat.dtype == np.float64
    # bbox string encodes 5 values
    assert len(feat_cols[0].split("image_")[1].split("_")) == 5


def test_bbox_str():
    s = get_bbox_str({"left": 1, "top": 2, "right": 3, "bottom": 4,
                      "score": 0.5})
    assert s == "1_2_3_4_0.5"


def test_dct_scaled_decode_feature_drift():
    """DCT-scaled JPEG decode (the default buffers path) must not drift
    the fc7 features materially vs the full-resolution decode — the
    reference's own stored-vs-recomputed tolerance method
    (reference: tests/test_compare_sbcmdlinetf.py:1-40 compares feature
    norms of independently computed extractions)."""
    import os

    from PIL import Image

    from columbiaimagesearch_tpu.models.sentibank import SentibankFeaturizer

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    img = np.asarray(Image.open(os.path.join(data, "grace_hopper.jpg"))
                     .convert("RGB"))
    # 640x480-class JPEG (the production ingest shape)
    big = np.asarray(Image.fromarray(img).resize((640, 480), Image.LANCZOS))
    b = io.BytesIO()
    Image.fromarray(big).save(b, format="JPEG", quality=85)
    jpeg = b.getvalue()

    f_fast = SentibankFeaturizer(dct_scale=True)
    f_exact = SentibankFeaturizer(dct_scale=False)
    a, st_a = f_fast.featurize_buffers([jpeg])
    bb, st_b = f_exact.featurize_buffers([jpeg])
    assert st_a[0] == 0 and st_b[0] == 0
    na, nb = np.linalg.norm(a[0]), np.linalg.norm(bb[0])
    cos = float(np.dot(a[0], bb[0]) / (na * nb))
    assert cos > 0.999, cos
    # norm drift within 1% (the reference compares norm deltas)
    assert abs(na - nb) / nb < 0.01, (na, nb)


def test_extractor_mixed_batch_keeps_fast_path():
    """A pre-decoded pixel array in a mixed batch must not kick the
    encoded buffers off the batched native decode path (regression for
    the r5 review finding: any_pixels disabled featurize_buffers for the
    whole batch, a 1-core throughput cliff)."""
    rng = np.random.RandomState(7)
    buf, _ = png_buffer(rng, 120, 90)
    raw = buf.getvalue()
    pixels = rng.randint(0, 255, (90, 120, 3), dtype=np.uint8)

    ex = GenericExtractor("full", "sentibank")
    calls = {"bufs": 0}
    orig = ex.featurizer.featurize_buffers

    def spy(raws):
        calls["bufs"] += len(raws)
        return orig(raws)

    ex.featurizer.featurize_buffers = spy
    try:
        outs = ex.process_batch([io.BytesIO(raw), pixels, io.BytesIO(raw)])
    finally:
        del ex.featurizer.featurize_buffers
    key = "ext:sentibank_feat_full_image"
    assert all(o[key + "_processed"] == "1" for o in outs)
    assert calls["bufs"] == 2  # both encoded buffers stayed on the path
    # The pixel input produced a real feature through the same columns.
    f_pix = featB64decode(outs[1][key], "sentibank")
    assert f_pix.shape == (4096,)
