"""Native C++ components: imgpipe decode/resize and the mmap codestore."""

import io

import numpy as np
import pytest
from PIL import Image

from columbiaimagesearch_tpu.native import (
    CodeStore,
    decode_resize_batch,
    imgpipe_available,
)


def encode(img, fmt):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format=fmt)
    return buf.getvalue()


def test_imgpipe_builds():
    assert imgpipe_available(), "native imgpipe should build in this image"


def test_decode_resize_matches_pil():
    rng = np.random.RandomState(0)
    # Smooth image so JPEG loss doesn't dominate the comparison.
    base = rng.rand(30, 40, 3)
    from scipy.ndimage import gaussian_filter

    img = (255 * gaussian_filter(base, (6, 6, 0))).astype(np.uint8)
    img = np.asarray(Image.fromarray(img).resize((200, 160)))

    jpg = encode(img, "JPEG")
    png = encode(img, "PNG")
    out, status = decode_resize_batch([jpg, png], target=256)
    assert status.tolist() == [0, 0]

    # PIL oracle on the PNG (lossless) path.
    pil = np.asarray(Image.open(io.BytesIO(png)).convert("RGB")
                     .resize((256, 256), Image.LANCZOS))
    diff = np.abs(out[1].astype(int) - pil.astype(int))
    assert diff.mean() < 2.0, diff.mean()  # same resampler up to rounding
    assert np.quantile(diff, 0.99) <= 6

    # JPEG output close to PNG output of the same pixels.
    jdiff = np.abs(out[0].astype(int) - out[1].astype(int))
    assert jdiff.mean() < 6.0


def test_decode_handles_corrupt_and_empty():
    out, status = decode_resize_batch([b"garbage", b""], target=64)
    assert status[0] == -1 and status[1] == -2
    assert (out == 0).all()


def test_decode_grayscale_and_threads():
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 255, (50, 70), dtype=np.uint8)
    png = encode(gray, "PNG")
    bufs = [png] * 16
    out, status = decode_resize_batch(bufs, target=128, n_threads=4)
    assert (status == 0).all()
    # Gray input becomes identical RGB channels.
    assert np.array_equal(out[0][..., 0], out[0][..., 1])
    # All outputs identical across the pool.
    for i in range(1, 16):
        np.testing.assert_array_equal(out[i], out[0])


def test_codestore_roundtrip_and_persistence(tmp_path):
    path = str(tmp_path / "codes.cs")
    rng = np.random.RandomState(2)
    cs = CodeStore(path, m=8)
    assert len(cs) == 0
    cells1 = rng.randint(0, 100, 50)
    codes1 = rng.randint(0, 256, (50, 8), dtype=np.uint8)
    ids1 = [f"sha1_{i:03d}" for i in range(50)]
    cs.append(cells1, codes1, ids1)
    assert len(cs) == 50
    # Appends across capacity growth.
    cells2 = rng.randint(0, 100, 3000)
    codes2 = rng.randint(0, 256, (3000, 8), dtype=np.uint8)
    ids2 = [f"sha1_b{i:04d}" for i in range(3000)]
    cs.append(cells2, codes2, ids2)
    cs.sync()
    assert len(cs) == 3050
    cs.close()

    # Reopen: durable, sorted export.
    cs2 = CodeStore(path, m=8)
    assert len(cs2) == 3050
    cells, codes, ids = cs2.read_all()
    assert (np.diff(cells) >= 0).all()  # cell-sorted
    all_cells = np.concatenate([cells1, cells2])
    np.testing.assert_array_equal(np.sort(all_cells), np.sort(cells))
    # Stable sort keeps insertion order within a cell.
    want_first = [i for c, i in sorted(
        zip(all_cells.tolist(), ids1 + ids2), key=lambda t: t[0])]
    assert ids == want_first

    # Cell query matches manual filter.
    target_cell = int(cells1[0])
    qcodes, qids = cs2.query_cell(target_cell)
    mask = all_cells == target_cell
    assert len(qids) == int(mask.sum())
    cs2.close()


def test_codestore_rejects_mismatched_m(tmp_path):
    path = str(tmp_path / "m.cs")
    cs = CodeStore(path, m=8)
    cs.append([1], np.zeros((1, 8), np.uint8), ["x"])
    cs.close()
    with pytest.raises(RuntimeError):
        CodeStore(path, m=16)
