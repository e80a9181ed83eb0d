"""Parallel native decode+resize with PIL fallback."""

import ctypes

import numpy as np

from columbiaimagesearch_tpu.native.build import load_library

_lib = None


def _get():
    global _lib
    if _lib is None:
        lib = load_library("imgpipe")
        if lib is not None:
            try:
                # A stale libimgpipe.so (copied tree / clock skew defeats
                # the mtime rebuild check) may predate the v2 symbol;
                # treat it as unavailable so callers hit the PIL fallback
                # instead of an AttributeError mid-decode.
                lib.imgpipe_process_batch_v2.restype = ctypes.c_int
                lib.imgpipe_process_batch_v2.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int, ctypes.c_int,
                ]
            except AttributeError:
                lib = None
        if lib is not None:
            try:
                # v3 symbol: Huffman-only coefficient extraction for the
                # device-side decode path. Optional — an older (v2) lib
                # keeps the pixel path working and read_coeffs_batch
                # reports unavailable.
                lib.imgpipe_read_coeffs_batch.restype = ctypes.c_int
                lib.imgpipe_read_coeffs_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int16),
                    ctypes.POINTER(ctypes.c_int16),
                    ctypes.POINTER(ctypes.c_uint16),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int,
                ]
                lib._has_coeffs = True
            except AttributeError:
                lib._has_coeffs = False
        _lib = lib if lib is not None else False
    return _lib or None


def jpeg_dims(buf):
    """Parse (height, width) from a JPEG SOF marker without decoding
    (header-only scan; used to bucket the device-decode path's batches
    by size before committing to a coefficient grid). Returns None for
    non-JPEG/corrupt buffers."""
    b = bytes(buf[:65536]) if not isinstance(buf, (bytes, bytearray)) \
        else bytes(buf)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    i = 2
    n = len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 3 >= n:
            return None
        seglen = (b[i + 2] << 8) | b[i + 3]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 >= n:
                return None
            h = (b[i + 5] << 8) | b[i + 6]
            w = (b[i + 7] << 8) | b[i + 8]
            return (h, w) if h > 0 and w > 0 else None
        i += 2 + seglen
    return None


def coeffs_available() -> bool:
    lib = _get()
    return bool(lib is not None and getattr(lib, "_has_coeffs", False))


def read_coeffs_batch(buffers, msub: int, max_bh: int, max_bw: int,
                      n_threads: int = 0):
    """Entropy-decode a batch of JPEGs to quantized DCT coefficients — the
    host half of the device-side decode path (the serial Huffman stage is
    the ONLY part of JPEG decode that can't run as batched TPU matmuls;
    dequant/IDCT/upsample/color/resize happen in
    models/jpeg_device.decode_jpeg_coeffs). Replaces the role of the
    reference's full-image cv2/PIL decode feeding its CPU Caffe forward
    (reference: cufacesearch/featurizer/sbpycaffe_img_featurizer.py:
    113-134) with a host stage ~3x cheaper per core.

    Only 3-component YCbCr 4:2:0 JPEGs fitting the [max_bh, max_bw] luma
    block grid are handled; other statuses route to decode_resize_batch.

    :param msub: per-block low-frequency subset side (1..8) the device
        IDCT reconstructs from (msub/8 scale, libjpeg scaled-IDCT
        spectral truncation)
    :returns: (ycoef [n, max_bh, max_bw, msub*msub] int16,
        ccoef [n, 2, max_bh//2, max_bw//2, msub*msub] int16,
        qtab [n, 2, msub*msub] uint16,
        dims [n, 6] int32 (h, w, bh, bw, cbh, cbw),
        status [n] int32 — 0 ok, <0 use the pixel path)
    """
    n = len(buffers)
    m2 = msub * msub
    ycoef = np.zeros((n, max_bh, max_bw, m2), dtype=np.int16)
    ccoef = np.zeros((n, 2, max_bh // 2, max_bw // 2, m2), dtype=np.int16)
    qtab = np.zeros((n, 2, m2), dtype=np.uint16)
    dims = np.zeros((n, 6), dtype=np.int32)
    status = np.full(n, -3, dtype=np.int32)
    if n == 0:
        return ycoef, ccoef, qtab, dims, status
    if not coeffs_available():
        return ycoef, ccoef, qtab, dims, status
    lib = _get()
    raw = [bytes(b) for b in buffers]
    arr = (ctypes.c_char_p * n)(*raw)
    lens = np.asarray([len(b) for b in raw], dtype=np.int64)
    lib.imgpipe_read_coeffs_batch(
        arr, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, msub, max_bh, max_bw,
        ycoef.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ccoef.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        qtab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return ycoef, ccoef, qtab, dims, status


def imgpipe_available() -> bool:
    return _get() is not None


def decode_resize_batch(buffers, target: int = 256, n_threads: int = 0,
                        dct_scale: bool = True):
    """Decode + lanczos-resize a batch of encoded images.

    :param buffers: list of bytes (JPEG/PNG encoded)
    :param target: output side length
    :param dct_scale: decode JPEGs DCT-scaled to a short side >= target
        before the Lanczos pass (libjpeg scale_num/scale_denom — the IDCT
        reconstructs fewer pixels, 2-4x faster per core for 640x480 ->
        256). False keeps the full-resolution decode, bit-identical to
        the reference preprocess (sbpycaffe_img_featurizer.py:113-134);
        feature drift of the scaled path is regression-checked in
        tests/test_extraction.py.
    :returns: ([n, target, target, 3] uint8 RGB, status int32 [n] — 0 ok)
    """
    n = len(buffers)
    out = np.zeros((n, target, target, 3), dtype=np.uint8)
    status = np.zeros(n, dtype=np.int32)
    if n == 0:
        return out, status

    lib = _get()
    if lib is not None:
        raw = [bytes(b) for b in buffers]
        arr = (ctypes.c_char_p * n)(*raw)
        lens = np.asarray([len(b) for b in raw], dtype=np.int64)
        lib.imgpipe_process_batch_v2(
            arr, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads, target if dct_scale else 0)
        return out, status

    # PIL fallback (single-threaded)
    import io

    from columbiaimagesearch_tpu.models.preprocess import resize_host

    for i, b in enumerate(buffers):
        try:
            from PIL import Image

            img = np.asarray(Image.open(io.BytesIO(bytes(b))).convert("RGB"))
            out[i] = resize_host(img) if target == 256 else np.asarray(
                Image.fromarray(img).resize((target, target), Image.LANCZOS))
        except Exception:
            status[i] = -1
    return out, status
