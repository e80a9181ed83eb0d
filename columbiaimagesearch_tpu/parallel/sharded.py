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
from columbiaimagesearch_tpu.index.tpu_query import (
    lopq_query,
    pack_rows_dists_ncells,
    unpack_rows_dists_ncells,
)
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
    """Row-sharded CSR multi-index over a device mesh, with device-side
    incremental append.

    Rows are dealt round-robin by global insertion index (row g lives on
    shard ``g % n_dev`` at slot ``g // n_dev``), kept in capacity-padded
    per-shard buffers in insertion order. Each refresh uploads ONLY the new
    rows; every shard re-sorts its slice and rebuilds its CSR offsets
    in-shard under one shard_map (no cross-device traffic — the same
    device-first refresh design as the single-chip LOPQSearcherTPU). A
    query executes the fused kernel on all shards simultaneously and
    all_gathers the per-shard top-k.
    """

    #: appended per-shard chunks are sentinel-padded to this multiple
    CHUNK_QUANTUM = 1024

    def __init__(self, model, mesh=None, probe_width=None):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(axis=SHARD_AXIS)
        if self.mesh.axis_names[0] != SHARD_AXIS:
            raise ValueError(f"index mesh axis must be '{SHARD_AXIS}'")
        self.probe_width = probe_width
        self.nb_indexed = 0
        self._ids = None          # [n] host object array, insertion order
        self._cells_host = None   # [n] int64, insertion order (rebuilds)
        self._fine_host = None    # [n, M] uint8
        self._buf_cells = None    # device [n_dev, cap_per] int32
        self._buf_fine = None     # device [n_dev, cap_per, M] uint8
        self._cap_per = 0
        self._n_dev_rows = 0      # rows present in device buffers
        self._dev = None
        self._qfns = {}

    # ------------------------------------------------------------- building

    def _fns(self, V, cap_per, kq, M):
        """Compiled shard_map append+build, cached per static config."""
        key = ("append", V, cap_per, kq, M)
        cached = self._qfns.get(key)
        if cached is not None:
            return cached
        mesh = self.mesh
        sentinel = V * V

        def shard_append(buf_c, buf_f, chunk_c, chunk_f, offset):
            # Per-shard views: buf_c [1, cap], buf_f [1, cap, M],
            # chunk_c [1, kq], chunk_f [1, kq, M], offset [1, 1].
            bc = jax.lax.dynamic_update_slice(buf_c[0], chunk_c[0],
                                              (offset[0, 0],))
            bf = jax.lax.dynamic_update_slice(
                buf_f[0], chunk_f[0], (offset[0, 0], jnp.int32(0)))
            order = jnp.argsort(bc, stable=True).astype(jnp.int32)
            codes = bf[order]
            real = (bc < sentinel).astype(jnp.int32)
            counts = jnp.zeros(sentinel, jnp.int32).at[
                jnp.minimum(bc, sentinel - 1)].add(real)
            cell_start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(counts).astype(jnp.int32)])
            return (bc[None], bf[None], codes[None], cell_start[None],
                    order[None])

        fn = jax.jit(jax.shard_map(
            shard_append, mesh=mesh,
            in_specs=(P(SHARD_AXIS),) * 5,
            out_specs=(P(SHARD_AXIS),) * 5,
        ), donate_argnums=(0, 1))
        self._qfns[key] = fn
        return fn

    def _ensure_model_dev(self):
        if self._dev is None:
            rep = NamedSharding(self.mesh, P())
            self._dev = {
                "Cs": jax.device_put(np.stack(self.model.Cs), rep),
                "Rs": jax.device_put(np.stack(self.model.Rs), rep),
                "mus": jax.device_put(np.stack(self.model.mus), rep),
                "subs": jax.device_put(
                    np.stack([np.stack(h)
                              for h in self.model.subquantizers]), rep),
            }

    @staticmethod
    def _deal(n0, k, n_dev):
        """Round-robin assignment of global rows [n0, n0+k) to shards."""
        g = np.arange(n0, n0 + k)
        return g % n_dev, g // n_dev

    def append(self, coarse, fine, ids=None):
        """Add rows; only the new rows cross the host->device boundary."""
        from columbiaimagesearch_tpu.utils.codes import ids_to_object_array

        V = self.model.V
        coarse = np.asarray(coarse)
        fine = np.asarray(fine).astype(np.uint8)
        k = len(coarse)
        if k == 0:
            return
        cells = (coarse[:, 0].astype(np.int64) * V
                 + coarse[:, 1].astype(np.int64))
        ids_arr = (np.arange(self.nb_indexed, self.nb_indexed + k,
                             dtype=object) if ids is None
                   else ids_to_object_array(ids, k))
        if self._ids is None:
            self._ids, self._cells_host, self._fine_host = (ids_arr, cells,
                                                            fine)
        else:
            self._ids = np.concatenate([self._ids, ids_arr])
            self._cells_host = np.concatenate([self._cells_host, cells])
            self._fine_host = np.concatenate([self._fine_host, fine])
        self._upload(prev_n=self.nb_indexed)
        self.nb_indexed = len(self._ids)

    def build(self, coarse, fine, ids=None):
        """Bulk (re)build: resets state then appends everything."""
        self.nb_indexed = 0
        self._ids = self._cells_host = self._fine_host = None
        self._buf_cells = self._buf_fine = None
        self._cap_per = 0
        self._n_dev_rows = 0
        self.append(coarse, fine, ids)

    def _upload(self, prev_n):
        """Push rows [prev_n, n) into the device buffers and rebuild CSR."""
        V = self.model.V
        n = len(self._ids)
        n_dev = self.mesh.devices.size
        M = self._fine_host.shape[1]
        sentinel = V * V
        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._ensure_model_dev()

        need_per = round_up(n // n_dev + 2 * self.CHUNK_QUANTUM,
                            self.CHUNK_QUANTUM)
        if self._buf_cells is None or need_per > self._cap_per:
            # (Re)allocate capacity buffers prefilled with every row.
            self._cap_per = need_per
            buf_c = np.full((n_dev, self._cap_per), sentinel, np.int32)
            buf_f = np.zeros((n_dev, self._cap_per, M), np.uint8)
            shard_of, slot_of = self._deal(0, n, n_dev)
            buf_c[shard_of, slot_of] = self._cells_host.astype(np.int32)
            buf_f[shard_of, slot_of] = self._fine_host
            self._buf_cells = jax.device_put(buf_c, sh)
            self._buf_fine = jax.device_put(buf_f, sh)
            kq = self.CHUNK_QUANTUM
            chunk_c = np.full((n_dev, kq), sentinel, np.int32)
            chunk_f = np.zeros((n_dev, kq, M), np.uint8)
            offsets = self._per_shard_count(n, n_dev)[:, None] \
                .astype(np.int32)
        else:
            k = n - prev_n
            if k == 0:
                return
            shard_of, slot_of = self._deal(prev_n, k, n_dev)
            base = self._per_shard_count(prev_n, n_dev)  # old occupancy
            per_new = np.bincount(shard_of, minlength=n_dev)
            kq = int(round_up(max(int(per_new.max()), 1),
                              self.CHUNK_QUANTUM))
            chunk_c = np.full((n_dev, kq), sentinel, np.int32)
            chunk_f = np.zeros((n_dev, kq, M), np.uint8)
            within = slot_of - base[shard_of]
            chunk_c[shard_of, within] = \
                self._cells_host[prev_n:n].astype(np.int32)
            chunk_f[shard_of, within] = self._fine_host[prev_n:n]
            offsets = base[:, None].astype(np.int32)

        fn = self._fns(V, self._cap_per, chunk_c.shape[1], M)
        (self._buf_cells, self._buf_fine, codes, cell_start,
         order) = fn(self._buf_cells, self._buf_fine,
                     jax.device_put(chunk_c, sh),
                     jax.device_put(chunk_f, sh),
                     jax.device_put(offsets, sh))
        self._n_dev_rows = n
        # Atomic swap: concurrent queries keep a consistent triple.
        dev = dict(self._dev)
        dev["codes"] = codes
        dev["cell_start"] = cell_start
        dev["order"] = order
        self._dev = dev

    @staticmethod
    def _per_shard_count(n, n_dev):
        """Occupancy of each shard after n globally-dealt rows."""
        base = np.full(n_dev, n // n_dev, dtype=np.int64)
        base[:n % n_dev] += 1
        return base

    # -------------------------------------------------------------- queries

    def _query_fn(self, V, B, Q, K):
        # Cache compiled fan-out functions per static config — building a
        # fresh shard_map closure per call would miss jax's jit cache.
        key = (V, B, Q, K)
        cached = self._qfns.get(key)
        if cached is not None:
            return cached
        mesh = self.mesh

        def shard_query(x, Cs, Rs, mus, subs, codes, cell_start, order,
                        quota):
            # Inside shard_map: codes [1, cap, M], cell_start [1, V^2+1],
            # order [1, cap] (sorted position -> in-shard insertion slot).
            rows, dists, total, ncells = lopq_query(
                x, Cs, Rs, mus, subs, codes[0], cell_start[0], quota,
                V=V, B=B, Q=Q, K=K)
            shard_id = jax.lax.axis_index(SHARD_AXIS)
            slots = order[0][jnp.maximum(rows, 0)]
            # global insertion index = slot * n_dev + shard (round-robin)
            rows_g = jnp.where(rows >= 0,
                               slots * mesh.devices.size + shard_id, -1)
            # all_gather the tiny top-k and merge on every shard.
            all_rows = jax.lax.all_gather(rows_g, SHARD_AXIS).reshape(-1)
            all_dists = jax.lax.all_gather(dists, SHARD_AXIS).reshape(-1)
            top_neg, top_i = jax.lax.top_k(-all_dists, K)
            # One packed int32 return -> one host sync (see tpu_query
            # pack_rows_dists_ncells).
            return pack_rows_dists_ncells(
                all_rows[top_i], -top_neg,
                jax.lax.psum(ncells, SHARD_AXIS))[None]

        fn = jax.jit(jax.shard_map(
            shard_query,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(SHARD_AXIS), P(SHARD_AXIS),
                      P(SHARD_AXIS), P()),
            out_specs=P(SHARD_AXIS),
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
                round_up(max(self._cap_per, 256), 256))
        K_pad = min(round_up(K, 16), Q)

        qfn = self._query_fn(V, B, Q, K_pad)
        d = self._dev          # snapshot (swapped atomically on refresh)
        ids_snap = self._ids
        packed = qfn(
            jnp.asarray(x, dtype=jnp.float32), d["Cs"], d["Rs"], d["mus"],
            d["subs"], d["codes"], d["cell_start"], d["order"],
            jnp.asarray(quota, dtype=jnp.int32))
        # Every shard returns the same merged top-k; take shard 0's copy.
        packed = np.asarray(packed)[0]                    # one D2H sync
        rows, dists, ncells = unpack_rows_dists_ncells(packed, K_pad)
        out = []
        for r, dist in zip(rows[:K], dists[:K]):
            if r < 0 or not np.isfinite(dist):
                continue
            out.append((ids_snap[int(r)], float(dist)))
        return out, int(ncells)


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
        import threading

        from columbiaimagesearch_tpu.utils.codes import IncrementalDedup

        self._parts = []  # pending (coarse [n,2] int32, fine [n,M], ids obj)
        self._dirty = False
        self._dedup = IncrementalDedup()
        self._mutlock = threading.RLock()
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
        with self._mutlock:
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
        with self._mutlock:
            self._parts.append((coarse, fine, ids))
            self._dirty = True

    def get_nb_indexed(self):
        self._maybe_build()
        return self.nb_indexed

    def _maybe_build(self):
        with self._mutlock:
            self._maybe_build_locked()

    def _maybe_build_locked(self):
        if self._dirty and self._parts:
            coarse = np.concatenate([p[0] for p in self._parts])
            fine = np.concatenate([p[1] for p in self._parts])
            ids = np.concatenate([p[2] for p in self._parts])
            self._parts = []
            # Exact first-insertion dedup, incremental: only the PENDING
            # rows are hashed (interned id table + sorted key set persist
            # across refreshes), then only survivors reach the device.
            cells = (coarse[:, 0].astype(np.int64) * self.model.V
                     + coarse[:, 1].astype(np.int64))
            keep = self._dedup.filter_new(cells, ids)
            if not keep.all():
                coarse, fine, ids = coarse[keep], fine[keep], ids[keep]
            if len(ids):
                self.index.append(coarse, fine, ids)
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
