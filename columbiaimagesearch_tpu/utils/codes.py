"""Code dtype conventions.

The reference sizes cluster-id dtypes to the codebook cardinality
(reference: lopq/lopq/utils.py:33-53 ``predict_cluster``): uint8 for <=256
clusters, uint16 for <=65536, else uint32. We keep the same convention at the
host API boundary; on device everything is int32 (TPU-native integer width).
"""

import numpy as np


def code_dtype_for(num_clusters: int):
    if num_clusters <= 256:
        return np.uint8
    elif num_clusters <= 65536:
        return np.uint16
    return np.uint32


def dedup_first_mask(cells, ids):
    """Boolean keep-mask selecting the FIRST occurrence of each (cell, id).

    Vectorized replacement for the reference's per-row duplicate check on
    insertion (reference: lopq/lopq/search.py:342-364): ids are interned to
    dense integers with a hash table (pandas ``factorize``; O(N) on object
    arrays), composed with the cell id into one int64 key, and first
    occurrences found in one pass. Works for any hashable id type.
    """
    n = len(cells)
    if n == 0:
        return np.ones(0, dtype=bool)
    cells = np.asarray(cells, dtype=np.int64)
    try:
        import pandas as pd

        idx = np.asarray(pd.factorize(np.asarray(ids, dtype=object))[0],
                         dtype=np.int64)
        if idx.min() < 0:  # NaN-like ids got the -1 sentinel; remap densely
            idx = idx - idx.min()
    except ImportError:  # pragma: no cover - pandas is baked into this image
        _, idx = np.unique(np.asarray(ids, dtype=object), return_inverse=True)
        idx = idx.astype(np.int64)
    if int(cells.max(initial=0)) >= (1 << 30) or int(idx.max()) >= (1 << 34):
        # Degenerate sizes that would overflow the packed key; fall back to
        # a two-column lexicographic unique.
        pairs = np.stack([cells, idx], axis=1)
        _, first_idx = np.unique(pairs, axis=0, return_index=True)
    else:
        keys = (cells << 34) | idx
        _, first_idx = np.unique(keys, return_index=True)
    keep = np.zeros(n, dtype=bool)
    keep[first_idx] = True
    return keep


def ids_to_object_array(ids, n):
    """Materialize an id iterable into an object ndarray without a Python
    per-element loop (C-level fill)."""
    if isinstance(ids, np.ndarray) and ids.dtype == object and len(ids) == n:
        return ids
    if not isinstance(ids, (list, tuple, np.ndarray)):
        ids = list(ids)
    ids_arr = np.empty(n, dtype=object)
    ids_arr[:] = ids[:n]
    return ids_arr
