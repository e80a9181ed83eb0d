"""Device-side JPEG reconstruction: dequant + IDCT + chroma upsample +
color conversion + Lanczos resize as batched TPU matmuls.

The reference decodes JPEGs entirely on the host CPU before its (also
CPU) Caffe forward (reference: cufacesearch/cufacesearch/featurizer/
sbpycaffe_img_featurizer.py:113-134; the batch tool
featurizer/data/extract_nfeatures.cpp:1-207 likewise feeds host-decoded
pixels). On TPU the CNN forward runs at ~33k img/s/chip, so host decode
is the extraction-e2e bottleneck: one core full-decodes only ~70-175
img/s. This module moves every decode stage EXCEPT the inherently serial
entropy (Huffman) decode onto the device:

- host: ``native.imgpipe.read_coeffs_batch`` — Huffman only, ~2.7x
  cheaper per core than full decode+resize (measured, see
  docs/BENCHMARKS.md decode-scaling section);
- device (this module, one jitted program per shape bucket):
  dequantization (elementwise), 8x8 IDCT restricted to the low-frequency
  ``msub`` x ``msub`` corner (spectral truncation — the same msub/8-scale
  reconstruction libjpeg's ``scale_num/scale_denom`` performs, fused here
  with an exact box-downscale and expressed as two [M, msub] matmul
  contractions per block — MXU work), 4:2:0 chroma upsampling, BT.601
  YCbCr->RGB, and a PIL-compatible Lanczos-3 resize to the staging size
  as two dense [target, H]/[target, W] matmuls.

Static shapes: a batch shares one (max_bh, max_bw, h, w) bucket (the
extraction pipeline already buckets by size for the batched forward);
images that don't fit the bucket or aren't 4:2:0 YCbCr fall back to the
host pixel path.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------- weights


def idct_box_matrix(msub: int) -> np.ndarray:
    """1-D operator [M, msub] mapping a block's low-frequency coefficient
    column to M output samples: exact 8-point IDCT of the truncated
    spectrum followed by an exact box-average 8 -> M downscale (fused as
    one matrix). M = msub, matching libjpeg's msub/8 scaled IDCT."""
    u = np.arange(8)
    c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    x = np.arange(8)
    A = 0.5 * c[:, None] * np.cos((2 * x[None, :] + 1) * u[:, None]
                                  * np.pi / 16.0)      # [u, x] -> s = A^T F
    M = msub
    # Box-average pooling 8 -> M with fractional window overlap.
    P = np.zeros((M, 8))
    step = 8.0 / M
    for i in range(M):
        lo, hi = i * step, (i + 1) * step
        for xx in range(8):
            ov = max(0.0, min(hi, xx + 1.0) - max(lo, xx))
            P[i, xx] = ov / step
    D = P @ A[:msub].T                                 # [M, msub]
    return D.astype(np.float32)


def lanczos_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense PIL-compatible Lanczos-3 resample operator [out, in] (the
    numpy mirror of native/imgpipe.cpp precompute_weights; weights in
    double, normalized per output pixel). Dense because on TPU a
    [256, H] matmul beats any gather formulation."""
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = 3.0 * fscale
    W = np.zeros((out_size, in_size))
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax)
        t = (xs - center + 0.5) / fscale
        w = np.sinc(t) * np.sinc(t / 3.0)
        w[(t <= -3.0) | (t >= 3.0)] = 0.0
        s = w.sum()
        W[o, xmin:xmax] = w / s if s != 0.0 else w
    return W.astype(np.float32)


# ----------------------------------------------------------------- device


def _plane_from_blocks(coef, q, D):
    """[n, BH, BW, msub*msub] int16 + [n, m2] quant -> [n, BH*M, BW*M]
    plane (level-shifted to 0..255 domain)."""
    n, BH, BW, m2 = coef.shape
    m = D.shape[1]
    M = D.shape[0]
    F = coef.astype(jnp.float32) * q[:, None, None, :]
    F = F.reshape(n, BH, BW, m, m)
    # s_block = D F D^T : [n, BH, BW, M, M]
    s = jnp.einsum("nhwuv,xu,yv->nhxwy", F, D, D,
                   precision=jax.lax.Precision.HIGHEST)
    return s.reshape(n, BH * M, BW * M) + 128.0


@functools.partial(jax.jit, static_argnames=("msub", "h", "w", "target"))
def decode_jpeg_coeffs(ycoef, ccoef, qtab, D, Wv, Wh, *, msub, h, w,
                       target=256):
    """Reconstruct a coefficient batch to [n, target, target, 3] float32
    RGB (0..255). See module docstring for the stage list.

    :param ycoef: [n, BH, BW, msub*msub] int16 (natural-order corner)
    :param ccoef: [n, 2, BH//2, BW//2, msub*msub] int16
    :param qtab: [n, 2, msub*msub] uint16 dequant tables (luma, chroma)
    :param D: [M, msub] idct_box_matrix(msub)
    :param Wv: [target, hs] lanczos_matrix(hs, target), hs = scaled height
    :param Wh: [target, ws] likewise for width
    :param h, w: true pixel dims of every image in the bucket (static)
    """
    q = qtab.astype(jnp.float32)
    Y = _plane_from_blocks(ycoef, q[:, 0], D)           # [n, BH*M, BW*M]
    Cb = _plane_from_blocks(ccoef[:, 0], q[:, 1], D)
    Cr = _plane_from_blocks(ccoef[:, 1], q[:, 1], D)
    # 4:2:0 chroma -> luma grid (x2 nearest; the subsequent >=2x Lanczos
    # minification low-passes any upsample-kernel difference away).
    Cb = jnp.repeat(jnp.repeat(Cb, 2, axis=1), 2, axis=2)
    Cr = jnp.repeat(jnp.repeat(Cr, 2, axis=1), 2, axis=2)
    # Scaled true dims: ceil(dim * msub / 8), libjpeg output size rule.
    hs = -(-h * msub // 8)
    ws = -(-w * msub // 8)
    Y = Y[:, :hs, :ws]
    Cb = Cb[:, :hs, :ws]
    Cr = Cr[:, :hs, :ws]
    # BT.601 (libjpeg jdcolor.c constants).
    R = Y + 1.402 * (Cr - 128.0)
    G = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    B = Y + 1.772 * (Cb - 128.0)
    rgb = jnp.stack([R, G, B], axis=-1)                 # [n, hs, ws, 3]
    rgb = jnp.clip(rgb, 0.0, 255.0)
    # Separable Lanczos as two dense matmuls over the batch.
    out = jnp.einsum("oh,nhwc->nowc", Wv, rgb,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,nowc->nopc", Wh, out,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(out, 0.0, 255.0)


class CoeffDecoder:
    """Per-bucket cached host weights + device constants for
    :func:`decode_jpeg_coeffs` (one instance per extraction pipeline)."""

    def __init__(self, target: int = 256):
        self.target = target
        self._cache = {}

    def weights(self, msub: int, h: int, w: int):
        key = (msub, h, w)
        if key not in self._cache:
            hs = -(-h * msub // 8)
            ws = -(-w * msub // 8)
            self._cache[key] = (
                jnp.asarray(idct_box_matrix(msub)),
                jnp.asarray(lanczos_matrix(hs, self.target)),
                jnp.asarray(lanczos_matrix(ws, self.target)),
            )
        return self._cache[key]

    def decode(self, ycoef, ccoef, qtab, *, msub, h, w):
        D, Wv, Wh = self.weights(msub, h, w)
        return decode_jpeg_coeffs(
            jnp.asarray(ycoef), jnp.asarray(ccoef), jnp.asarray(qtab),
            D, Wv, Wh, msub=msub, h=h, w=w, target=self.target)


def pick_msub(h: int, w: int, target: int = 256) -> int:
    """Smallest msub/8 scale whose SHORT side still covers the resize
    target (the native pixel path's DCT-scale rule,
    native/imgpipe.cpp decode_jpeg)."""
    base = min(h, w)
    for m in range(1, 9):
        if base * m >= target * 8:
            return m
    return 8
