"""Device-side JPEG decode (models/jpeg_device.py + native coefficient
extraction): the host does Huffman only; dequant/IDCT/upsample/color/
resize run as batched device matmuls.

Covers: the IDCT+box-downscale operator vs a numpy oracle, full-pipeline
pixel parity vs the host decode, fc7 feature drift through the real
featurizer (mixed batch with non-JPEG / odd-subsampling / minority-size
fallbacks), and the header-only dimension parser.

Reference contract being replaced: host-side full decode + resize
feeding the CNN (cufacesearch/featurizer/sbpycaffe_img_featurizer.py:
113-134, featurizer/data/extract_nfeatures.cpp:1-207).
"""

import io

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.models.jpeg_device import (
    CoeffDecoder,
    idct_box_matrix,
    lanczos_matrix,
    pick_msub,
)
from columbiaimagesearch_tpu.native.imgpipe import (
    coeffs_available,
    decode_resize_batch,
    jpeg_dims,
    read_coeffs_batch,
)

pytestmark = pytest.mark.skipif(
    not coeffs_available(), reason="native imgpipe v3 not built")

rng = np.random.RandomState(7)


def mk_jpg(h, w, q=90, sub=2, seed=0):
    r = np.random.RandomState(seed)
    x = np.linspace(0, 11, w)
    img = (120 + 70 * np.sin(x)[None, :, None]
           + 35 * r.rand(h, w, 3)).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=q, subsampling=sub)
    return buf.getvalue()


def test_idct_box_matrix_oracle():
    """msub=8, M=8: D must equal the plain 8-point IDCT (the pooling
    matrix is identity); a DC-only block must reconstruct flat."""
    D = idct_box_matrix(8)
    u = np.arange(8)
    c = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    A = 0.5 * c[:, None] * np.cos(
        (2 * np.arange(8)[None, :] + 1) * u[:, None] * np.pi / 16)
    np.testing.assert_allclose(D, A.T, atol=1e-6)
    # DC-only 2-D block: value = dc / 8 at any msub
    for m in (4, 5, 8):
        Dm = idct_box_matrix(m)
        F = np.zeros((m, m))
        F[0, 0] = 80.0
        s = Dm @ F @ Dm.T
        np.testing.assert_allclose(s, 10.0, atol=1e-4)


def test_lanczos_matrix_matches_pil():
    r = np.random.RandomState(3)
    img = (r.rand(300, 200) * 255).astype(np.float64)
    Wv = lanczos_matrix(300, 64).astype(np.float64)
    Wh = lanczos_matrix(200, 64).astype(np.float64)
    ours = Wv @ img @ Wh.T
    pil = np.asarray(Image.fromarray(img.astype(np.float32), mode="F")
                     .resize((64, 64), Image.LANCZOS))
    np.testing.assert_allclose(ours, pil, atol=0.1)


def test_pick_msub():
    assert pick_msub(480, 640) == 5   # 480*5/8 = 300 >= 256
    assert pick_msub(512, 512) == 4   # 512*4/8 = 256
    assert pick_msub(2048, 2048) == 1
    assert pick_msub(260, 800) == 8


def test_jpeg_dims_parser():
    assert jpeg_dims(mk_jpg(480, 640)) == (480, 640)
    assert jpeg_dims(mk_jpg(37, 53)) == (37, 53)
    assert jpeg_dims(b"notanimage") is None
    buf = io.BytesIO()
    Image.fromarray(np.zeros((20, 30, 3), np.uint8)).save(buf, "PNG")
    assert jpeg_dims(buf.getvalue()) is None
    # progressive JPEGs use SOF2
    buf = io.BytesIO()
    Image.fromarray(np.zeros((44, 66, 3), np.uint8)).save(
        buf, "JPEG", progressive=True)
    assert jpeg_dims(buf.getvalue()) == (44, 66)


def test_device_decode_matches_host_pixels():
    """Full device reconstruction within JPEG tolerance of the host
    full-res decode path (mean < 3 gray levels; the difference is the
    msub/8 spectral truncation + box vs scaled-IDCT downscale)."""
    jpg = mk_jpg(480, 640, seed=1)
    msub = pick_msub(480, 640)
    yc, cc, qt, dims, st = read_coeffs_batch([jpg] * 3, msub, 60, 80)
    assert (st == 0).all()
    assert list(dims[0]) == [480, 640, 60, 80, 30, 40]
    dec = CoeffDecoder(target=256)
    out = np.asarray(dec.decode(yc, cc, qt, msub=msub, h=480, w=640))
    host, st2 = decode_resize_batch([jpg] * 3, target=256, n_threads=1,
                                    dct_scale=False)
    assert (st2 == 0).all()
    diff = np.abs(out - host.astype(np.float32))
    assert diff.mean() < 3.0, diff.mean()
    assert np.percentile(diff, 99) < 12.0


def test_odd_dims_and_full_subset():
    """Non-multiple-of-16 dims (partial edge blocks) and msub=8."""
    jpg = mk_jpg(130, 202, seed=2)
    yc, cc, qt, dims, st = read_coeffs_batch([jpg], 8, 18, 28)
    assert st[0] == 0
    dec = CoeffDecoder(target=64)
    out = np.asarray(dec.decode(yc, cc, qt, msub=8, h=130, w=202))
    host, _ = decode_resize_batch([jpg], target=64, n_threads=1,
                                  dct_scale=False)
    assert np.abs(out - host.astype(np.float32)).mean() < 3.0


def test_unsupported_layouts_fall_back():
    """4:4:4, grayscale, PNG, garbage -> nonzero status (pixel path)."""
    j444 = mk_jpg(64, 64, sub=0)
    gray = io.BytesIO()
    Image.fromarray(np.zeros((64, 64), np.uint8)).save(gray, "JPEG")
    png = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(png, "PNG")
    toolarge = mk_jpg(96, 96)  # exceeds the 8x8 block bucket below
    _, _, _, _, st = read_coeffs_batch(
        [j444, gray.getvalue(), png.getvalue(), b"xx", toolarge], 4, 8, 8)
    assert st[0] == -3 and st[1] == -3 and st[2] == -3
    assert st[3] in (-1, -3) and st[4] == -4


def test_featurizer_device_decode_parity():
    """End-to-end through SentibankFeaturizer: device_decode=True must
    reproduce the host path's statuses exactly and its fc7 features to
    cos > 0.995 on worst-case noise images (real photos track higher;
    the host DCT-scale path itself is held to cos > 0.999 on a photo in
    tests/test_extraction.py), with mixed-batch fallbacks mid-batch."""
    import jax

    from columbiaimagesearch_tpu.models.sentibank import SentibankFeaturizer

    bufs = [mk_jpg(200, 280, seed=i) for i in range(4)]
    png = io.BytesIO()
    Image.fromarray((rng.rand(100, 150, 3) * 255).astype(np.uint8)).save(
        png, "PNG")
    bufs.insert(1, png.getvalue())          # pixel fallback mid-batch
    bufs.insert(3, mk_jpg(120, 90, seed=9))  # minority size -> pixel path
    bufs.append(b"broken")                   # decode error

    f_host = SentibankFeaturizer(seed=0)
    f_dev = SentibankFeaturizer(seed=0, device_decode=True)
    f_dev.params = f_host.params
    feats_h, st_h = f_host.featurize_buffers(bufs)
    feats_d, st_d = f_dev.featurize_buffers(bufs)
    assert list(st_h) == list(st_d)
    ok = np.asarray(st_h) == 0
    cos = (feats_h[ok] * feats_d[ok]).sum(1) / (
        np.linalg.norm(feats_h[ok], axis=1)
        * np.linalg.norm(feats_d[ok], axis=1) + 1e-30)
    assert (cos > 0.995).all(), cos
