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
    per-element loop (C-level fill). Sequence-typed ids (tuples/lists as a
    single id — permitted by the reference searchers) fall back to a
    per-element fill, since numpy would otherwise broadcast them."""
    if isinstance(ids, np.ndarray) and ids.dtype == object and len(ids) == n:
        return ids
    if not isinstance(ids, (list, tuple, np.ndarray)):
        ids = list(ids)
    ids_arr = np.empty(n, dtype=object)
    try:
        ids_arr[:] = ids[:n]
    except ValueError:  # per-id sequences: assign one by one
        for i in range(n):
            ids_arr[i] = ids[i]
    return ids_arr


class IncrementalDedup:
    """Exact first-insertion (cell, id) dedup across refreshes.

    Ids intern into a persistent dense-int table so only NEW rows are
    hashed per refresh; seen keys live in one sorted int64 array. Shared
    by the single-chip and sharded searcher repack paths (reference
    duplicate handling: lopq/lopq/search.py:342-364).
    """

    def __init__(self):
        self._id_index = {}
        self._bulk_uniques = None  # lazily materialized into _id_index
        self._keys = None

    def _materialize(self):
        """Turn a deferred bulk factorize result into the intern dict
        (only needed once incremental appends start)."""
        if self._bulk_uniques is not None:
            uniques, had_nan = self._bulk_uniques
            self._id_index = dict(zip(list(uniques), range(len(uniques))))
            if had_nan:
                self._id_index[None] = len(self._id_index)
            self._bulk_uniques = None

    def filter_new(self, cells_new, ids_new):
        """Keep-mask over the new rows: first occurrence of a never-seen
        (cell, id)."""
        n = len(cells_new)
        idx = np.empty(n, dtype=np.int64)
        d = self._id_index
        if not d and self._bulk_uniques is None and n > 100_000:
            # Bulk path: hash-based factorize; defer the Python dict build
            # (10-15 s at 10M ids) until an incremental append needs it.
            import pandas as pd

            codes_i, uniques = pd.factorize(ids_new)
            idx[:] = codes_i
            had_nan = bool(idx.min() < 0)
            if had_nan:
                # NaN-like ids get factorize's -1 sentinel; give them one
                # dedicated dense code (an OR with -1 would collapse keys
                # across cells).
                idx[idx < 0] = len(uniques)
            self._bulk_uniques = (uniques, had_nan)
        else:
            self._materialize()
            d = self._id_index
            for i, x in enumerate(ids_new):
                v = d.get(x)
                if v is None:
                    v = len(d)
                    d[x] = v
                idx[i] = v
        keys = (np.asarray(cells_new, dtype=np.int64) << 34) | idx
        keep = np.zeros(n, dtype=bool)
        _, first = np.unique(keys, return_index=True)
        keep[first] = True
        if self._keys is not None and len(self._keys):
            pos = np.minimum(np.searchsorted(self._keys, keys),
                             len(self._keys) - 1)
            keep &= self._keys[pos] != keys
        new_keys = keys[keep]
        self._keys = np.sort(new_keys if self._keys is None
                             else np.concatenate([self._keys, new_keys]))
        return keep
