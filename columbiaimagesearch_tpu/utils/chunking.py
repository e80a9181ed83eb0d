"""Shape utilities for static-shape (jit-friendly) batching."""

import numpy as np
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def wave_bucket(n: int) -> int:
    """Quantized serving-wave batch size: next power of two up to 128, then
    multiples of 128. Query programs are jitted with the batch dimension as
    a static shape, so padding waves to this small bucket set bounds the
    number of distinct compilations (each remote compile costs 30-300 s on
    the axon relay) instead of compiling once per observed wave size."""
    if n <= 128:
        return 1 << max(0, int(n - 1).bit_length())
    return round_up(n, 128)


def pad_rows(x, multiple: int, fill=0.0):
    """Pad the leading dimension of ``x`` up to a multiple of ``multiple``.

    Returns ``(padded, n_valid)``. Works on numpy and jax arrays; padding is
    applied outside of jit so downstream kernels see static shapes.
    """
    n = x.shape[0]
    target = round_up(max(n, 1), multiple)
    if target == n:
        return x, n
    pad_width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    if isinstance(x, np.ndarray):
        padded = np.pad(x, pad_width, constant_values=fill)
    else:
        padded = jnp.pad(x, pad_width, constant_values=fill)
    return padded, n
