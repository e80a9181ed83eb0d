"""Shared nn layers with Caffe-compatible semantics."""

import jax
import jax.numpy as jnp


def lrn(x, local_size: int = 5, alpha: float = 1e-4, beta: float = 0.75,
        k: float = 1.0):
    """Across-channel Local Response Normalization, Caffe semantics.

    ``out = x / (k + (alpha / n) * sum_window(x^2))^beta`` where the sum runs
    over a window of ``local_size`` channels centered on each channel
    (reference net: featurizer/data/pycaffe_sentibank.prototxt norm1/norm2;
    the TF mirror passes alpha/n to tf.nn.lrn,
    reference: featurizer/sbtf_img_featurizer.py:28-31).

    x is NHWC; the channel window sum is one reduce_window over axis -1.
    """
    half = local_size // 2
    sq = x * x
    window_sum = jax.lax.reduce_window(
        sq, 0.0, jax.lax.add,
        window_dimensions=(1, 1, 1, local_size),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (0, 0), (half, half)),
    )
    scale = k + (alpha / local_size) * window_sum
    return x / (scale ** beta)


def caffe_max_pool(x, window: int = 3, stride: int = 2):
    """Max pool with Caffe's ceil-mode output size.

    Caffe pools use ceil((H - k) / s) + 1 output positions, padding the input
    edge as needed (vs XLA's default floor). AlexNet's 3x3/2 pools rely on
    this (55 -> 28 would be floor 27; caffe gives 27 for 55?
    ceil((55-3)/2)+1 = 27, floor same; but 13 -> ceil((13-3)/2)+1 = 6).
    For the Sentibank net all pool shapes agree between ceil and floor except
    none — we still implement ceil-mode for exactness with Caffe layouts.
    """
    n, h, w, c = x.shape

    def out_size(size):
        return -(-(size - window) // stride) + 1  # ceil

    oh, ow = out_size(h), out_size(w)
    pad_h = max((oh - 1) * stride + window - h, 0)
    pad_w = max((ow - 1) * stride + window - w, 0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )
