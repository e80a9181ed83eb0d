"""Shape utilities for static-shape (jit-friendly) batching."""

import numpy as np
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


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
