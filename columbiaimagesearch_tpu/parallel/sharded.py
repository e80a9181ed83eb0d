"""Mesh-parallel LOPQ: data-parallel training steps and the sharded index.

Two parallelism axes, mirroring how the reference scales (more extractor
processes; LMDB spill for big indexes — reference: updater/
extraction_processor.py, lopq/lopq/search.py:385-499) but expressed as XLA
collectives over the ICI instead of a message bus:

- **dp** (data parallel): k-means / PCA / encoding shard rows across the
  mesh; GSPMD inserts the psum for the centroid/covariance reductions.
- **shard** (index parallel): PQ codes are row-sharded; a query runs the
  fused probe+ADC kernel on every shard simultaneously under ``shard_map``
  and merges per-shard top-k via ``all_gather`` (k is tiny, so the collective
  is a few KB).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from columbiaimagesearch_tpu.index.tpu_encode import lopq_encode
from columbiaimagesearch_tpu.index.tpu_query import lopq_query
from columbiaimagesearch_tpu.parallel.mesh import SHARD_AXIS, make_mesh, shard_rows
from columbiaimagesearch_tpu.utils.chunking import round_up


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=())
def dp_lloyd_step(X, w, C, k: int):
    """One Lloyd iteration, GSPMD-parallel over row-sharded X.

    With X/w sharded over 'dp' and C replicated, XLA lowers the one-hot
    matmul reduction to local matmuls + a psum over the mesh.

    :returns: (new centroids [k, D], inertia scalar)
    """
    c2 = jnp.sum(C * C, axis=1)
    prod = jnp.dot(X, C.T, preferred_element_type=jnp.float32,
                   precision="highest")
    d2 = c2[None, :] - 2.0 * prod
    a = jnp.argmin(d2, axis=1)
    md = jnp.maximum(jnp.take_along_axis(d2, a[:, None], axis=1)[:, 0]
                     + jnp.sum(X * X, axis=1), 0.0)
    onehot = jax.nn.one_hot(a, k, dtype=jnp.float32) * w[:, None]
    sums = jnp.dot(onehot.T, X, preferred_element_type=jnp.float32,
                   precision="highest")
    counts = jnp.sum(onehot, axis=0)
    C_new = jnp.where(counts[:, None] > 0,
                      sums / jnp.maximum(counts, 1.0)[:, None], C)
    return C_new, jnp.sum(md * w)


def dp_encode(mesh, Cs, Rs, mus, subs, X, chunk: int = 2048):
    """Encode rows of X data-parallel across the mesh.

    Parameters are replicated; X is row-sharded; the fused encoder runs
    per-shard with no cross-device traffic.
    """
    n_dev = mesh.devices.size
    X = np.asarray(X, dtype=np.float32)
    n = len(X)
    chunk = min(chunk, max(round_up(n, n_dev) // n_dev, 1))
    # The per-shard fused encoder needs each shard's row count to be a
    # multiple of its internal chunk.
    target = round_up(max(n, 1), chunk * n_dev)
    if target != n:
        X = np.pad(X, [(0, target - n), (0, 0)])
    Xp, _ = shard_rows(mesh, X)
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(a, rep) for a in (Cs, Rs, mus, subs)]
    coarse, fine = lopq_encode(*args, Xp, chunk=chunk)
    return np.asarray(coarse)[:n], np.asarray(fine)[:n]


class ShardedLOPQIndex:
    """Row-sharded CSR multi-index over a device mesh.

    Each shard holds an interleaved slice of the (cell-sorted) codes with its
    own CSR offsets; a query executes the single-chip fused kernel on all
    shards under shard_map and all_gathers the per-shard top-k.
    """

    def __init__(self, model, mesh=None, probe_width=None):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(axis=SHARD_AXIS)
        if self.mesh.axis_names[0] != SHARD_AXIS:
            raise ValueError(f"index mesh axis must be '{SHARD_AXIS}'")
        self.probe_width = probe_width
        self.nb_indexed = 0
        self._ids = None          # [n_dev, per] host object array
        self._dev = None
        self._qfns = {}

    # ------------------------------------------------------------- building

    def build(self, coarse, fine, ids=None):
        """Pack codes into per-shard CSR layouts and upload.

        Rows are sorted by cell then dealt round-robin to shards, so every
        shard sees a balanced slice of every hot cell.
        """
        V = self.model.V
        coarse = np.asarray(coarse)
        fine = np.asarray(fine).astype(np.uint8)
        n = len(coarse)
        cells = coarse[:, 0].astype(np.int64) * V + coarse[:, 1].astype(np.int64)
        if ids is None:
            ids_arr = np.arange(n, dtype=object)
        else:
            from columbiaimagesearch_tpu.utils.codes import ids_to_object_array

            ids_arr = ids_to_object_array(ids, n)

        order = np.argsort(cells, kind="stable")
        cells, fine, ids_arr = cells[order], fine[order], ids_arr[order]

        n_dev = self.mesh.devices.size
        per = round_up(max(n, 1), n_dev) // n_dev
        M = fine.shape[1]

        codes_sh = np.zeros((n_dev, per, M), dtype=np.uint8)
        starts_sh = np.zeros((n_dev, V * V + 1), dtype=np.int32)
        ids_sh = np.empty((n_dev, per), dtype=object)
        ids_sh.fill(None)

        # Vectorized round-robin deal: row i -> shard i % n_dev, slot
        # i // n_dev. One scatter for codes/ids and one 2-d bincount for the
        # per-shard CSR offsets (no per-device Python pass over the rows).
        if n:
            shard_of = np.arange(n) % n_dev
            slot_of = np.arange(n) // n_dev
            codes_sh[shard_of, slot_of] = fine
            ids_sh[shard_of, slot_of] = ids_arr
            counts = np.bincount(shard_of * (V * V) + cells,
                                 minlength=n_dev * V * V)
            counts = counts.reshape(n_dev, V * V)
            starts_sh[:, 1:] = np.cumsum(counts, axis=1)
            # Padding rows sit past cell_start[-1], never probed.

        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        rep = NamedSharding(self.mesh, P())
        self._dev = {
            "codes": jax.device_put(codes_sh, sh),
            "cell_start": jax.device_put(starts_sh, sh),
            "Cs": jax.device_put(np.stack(self.model.Cs), rep),
            "Rs": jax.device_put(np.stack(self.model.Rs), rep),
            "mus": jax.device_put(np.stack(self.model.mus), rep),
            "subs": jax.device_put(
                np.stack([np.stack(h) for h in self.model.subquantizers]), rep),
        }
        self._ids = ids_sh
        self.nb_indexed = n
        self._per = per

    # -------------------------------------------------------------- queries

    def _query_fn(self, V, B, Q, K):
        # Cache compiled fan-out functions per static config — building a
        # fresh shard_map closure per call would miss jax's jit cache.
        key = (V, B, Q, K)
        cached = self._qfns.get(key)
        if cached is not None:
            return cached
        mesh = self.mesh

        def shard_query(x, Cs, Rs, mus, subs, codes, cell_start, quota):
            # Inside shard_map: codes [1, per, M], cell_start [1, V^2+1].
            rows, dists, total, ncells = lopq_query(
                x, Cs, Rs, mus, subs, codes[0], cell_start[0], quota,
                V=V, B=B, Q=Q, K=K)
            shard_id = jax.lax.axis_index(SHARD_AXIS)
            rows_g = jnp.where(rows >= 0,
                               rows * mesh.devices.size + shard_id, -1)
            # all_gather the tiny top-k and merge on every shard.
            all_rows = jax.lax.all_gather(rows_g, SHARD_AXIS).reshape(-1)
            all_dists = jax.lax.all_gather(dists, SHARD_AXIS).reshape(-1)
            top_neg, top_i = jax.lax.top_k(-all_dists, K)
            return (all_rows[top_i][None], (-top_neg)[None],
                    jax.lax.psum(total, SHARD_AXIS)[None],
                    jax.lax.psum(ncells, SHARD_AXIS)[None])

        fn = jax.jit(jax.shard_map(
            shard_query,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        ))
        self._qfns[key] = fn
        return fn

    def search(self, x, quota=10, limit=None):
        """Fan the query out to all shards; returns ([(id, dist)], cells_visited)."""
        if isinstance(x, np.ndarray) is False:
            x = np.asarray(x, dtype=np.float32)
        from columbiaimagesearch_tpu.index.model import LOPQModelPCA

        if isinstance(self.model, LOPQModelPCA):
            x = self.model.apply_PCA(x)

        V = self.model.V
        B = self.probe_width or min(V, 64)
        K = min(limit if limit is not None else quota, max(self.nb_indexed, 1))
        Q = min(round_up(int(quota * 1.5) + 256, 1024),
                round_up(max(self._per, 256), 256))
        K_pad = min(round_up(K, 16), Q)

        qfn = self._query_fn(V, B, Q, K_pad)
        d = self._dev
        rows, dists, total, ncells = qfn(
            jnp.asarray(x, dtype=jnp.float32), d["Cs"], d["Rs"], d["mus"],
            d["subs"], d["codes"], d["cell_start"],
            jnp.asarray(quota, dtype=jnp.int32))
        # Every shard returns the same merged top-k; take shard 0's copy.
        rows = np.asarray(rows)[0]
        dists = np.asarray(dists)[0]
        n_dev = self.mesh.devices.size
        out = []
        for r, dist in zip(rows[:K], dists[:K]):
            if r < 0 or not np.isfinite(dist):
                continue
            d_id, d_row = int(r) % n_dev, int(r) // n_dev
            out.append((self._ids[d_id, d_row], float(dist)))
        return out, int(np.asarray(ncells)[0])


class ShardedLOPQSearcher:
    """LOPQSearcher-compatible facade over :class:`ShardedLOPQIndex`.

    Drop-in index backend for SearcherLOPQ when serving on a multi-chip
    mesh: accumulates code dicts, rebuilds the sharded CSR lazily, and
    returns the same Result tuples as the single-chip searchers.
    """

    def __init__(self, model, mesh=None, probe_width=None):
        self.model = model
        self.index = ShardedLOPQIndex(model, mesh=mesh,
                                      probe_width=probe_width)
        self._parts = []  # list of (coarse [n,2] int32, fine [n,M], ids obj)
        self._dirty = False
        self.nb_indexed = 0

    def add_codes(self, codes, ids=None):
        """Array-path insertion: codes is (coarse [n,2], fine [n,M])."""
        from columbiaimagesearch_tpu.utils.codes import ids_to_object_array

        coarse, fine = codes
        coarse = np.asarray(coarse, dtype=np.int32)
        fine = np.asarray(fine, dtype=np.int32)
        n = len(coarse)
        ids_arr = (np.arange(n, dtype=object) if ids is None
                   else ids_to_object_array(ids, n))
        self._parts.append((coarse, fine, ids_arr))
        self._dirty = True

    def add_codes_from_dict(self, codes_dict):
        n = len(codes_dict)
        if n == 0:
            return
        ids = np.empty(n, dtype=object)
        ids[:] = list(codes_dict.keys())
        coarse = np.asarray([codes_dict[i][0] for i in ids], dtype=np.int32)
        fine = np.asarray([codes_dict[i][1] for i in ids], dtype=np.int32)
        self._parts.append((coarse, fine, ids))
        self._dirty = True

    def get_nb_indexed(self):
        self._maybe_build()
        return self.nb_indexed

    def _maybe_build(self):
        if self._dirty and self._parts:
            from columbiaimagesearch_tpu.utils.codes import dedup_first_mask

            coarse = np.concatenate([p[0] for p in self._parts])
            fine = np.concatenate([p[1] for p in self._parts])
            ids = np.concatenate([p[2] for p in self._parts])
            self._parts = [(coarse, fine, ids)]
            # Dedup (cell, id) keeping first insertion — vectorized.
            cells = (coarse[:, 0].astype(np.int64) * self.model.V
                     + coarse[:, 1].astype(np.int64))
            keep = dedup_first_mask(cells, ids)
            if not keep.all():
                coarse, fine, ids = coarse[keep], fine[keep], ids[keep]
            self.index.build(coarse, fine, ids)
            self.nb_indexed = self.index.nb_indexed
            self._dirty = False

    def search(self, x, quota=10, limit=None, with_dists=False):
        from columbiaimagesearch_tpu.index.searcher import Result, ResultDist

        self._maybe_build()
        if self.nb_indexed == 0:
            return [], 0
        pairs, visited = self.index.search(x, quota=quota, limit=limit)
        if with_dists:
            out = [ResultDist(rid, None, dist) for rid, dist in pairs]
        else:
            out = [Result(rid, None) for rid, dist in pairs]
        return out, visited
