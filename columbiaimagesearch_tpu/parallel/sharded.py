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
    escalate_probe,
    lopq_query,
    pack_query_out,
    probe_ladder,
    rung_floor,
    rung_parts,
    unpack_query_out,
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
    #: tier-hint hysteresis period — same policy (and same tunable) as
    #: LOPQSearcherTPU.REPROBE_EVERY.
    REPROBE_EVERY = 32

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

    def __init__(self, model, mesh=None, probe_width=None,
                 rerank_dtype="auto", capacity_hint=0):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(axis=SHARD_AXIS)
        if self.mesh.axis_names[0] != SHARD_AXIS:
            raise ValueError(f"index mesh axis must be '{SHARD_AXIS}'")
        self.probe_width = probe_width
        #: expected index size (global rows): pre-sizes host mirror AND
        #: per-shard device buffers so production refreshes never pay a
        #: capacity-growth realloc/recompile (single-chip parity:
        #: LOPQSearcherTPU.capacity_hint).
        self.capacity_hint = int(capacity_hint)
        #: per-shard rerank-store dtype policy — same plan as the
        #: single-chip store (LOPQSearcherTPU._plan_rerank_dtype): "auto"
        #: keeps float32 while ONE [cap_per, D] copy fits the per-chip
        #: budget, bfloat16 beyond; appends are donated in-place.
        self.rerank_dtype = rerank_dtype
        self.nb_indexed = 0
        # Host mirror in CAPACITY-padded arrays, appended in place
        # (see _host_reserve); rows past _n_host are uninitialized.
        self._host_capn = 0
        self._n_host = 0
        self._ids = None          # [host_cap] object, insertion order
        self._cells_host = None   # [host_cap] int64 (rebuilds)
        self._fine_host = None    # [host_cap, M] uint8
        self._feats_host = None   # [host_cap, D] f32 rerank, or None
        self._buf_cells = None    # device [n_dev, cap_per] int32
        self._buf_fine = None     # device [n_dev, cap_per, M] uint8
        self._buf_feats = None    # device [n_dev, cap_per, D] f32
        self._cap_per = 0
        self._n_dev_rows = 0      # rows present in device buffers
        self._dev = None
        self._qfns = {}
        import threading as _threading

        #: serving observability (see LOPQSearcherTPU.probe_stats)
        self.probe_stats = {"waves": 0, "escalated_queries": 0}
        self._stats_lock = _threading.Lock()
        # Serializes uploads against query snapshot reads: the one retry
        # in search_batch must block until an in-flight donating upload
        # swaps self._dev, or it re-reads the SAME stale dict and the
        # second failure propagates to the client (single-chip parity:
        # _snapshot blocks on _mutlock until the pack finishes).
        self._swaplock = _threading.RLock()
        self._tier_hint = 0       # probe-ladder start rung (hysteresis,
        self._wave_i = 0          # same policy as LOPQSearcherTPU)
        self._yield_ema = None    # candidates-per-cell EMA (rung floor)
        self._brute_i = 0         # hint-driven brute waves (_use_brute)
        self._force_reprobe = False

    @property
    def has_rerank_feats(self):
        return self._feats_host is not None and self.nb_indexed > 0

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

    def append(self, coarse, fine, ids=None, feats=None):
        """Add rows; only the new rows cross the host->device boundary.
        ``feats`` [k, D] keeps the matching index-space features resident
        (row-sharded like the codes) for device-exact reranking — the
        SURVEY §7.6 'codes + raw-rerank features across the mesh' store.
        As on the single-chip searcher, one featureless append drops the
        whole store (a gap would corrupt exact distances)."""
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
        if feats is not None:
            feats = np.ascontiguousarray(feats, dtype=np.float32)
            if len(feats) != k:
                raise ValueError(
                    f"feats rows {len(feats)} != codes rows {k}")
        if feats is None or (self.nb_indexed and self._feats_host is None):
            # One featureless append drops the store (see docstring).
            if self._feats_host is not None:
                self._feats_host = None
                self._buf_feats = None
            feats = None
        n0 = self.nb_indexed
        self._host_reserve(n0 + k, fine.shape[1],
                           feats.shape[1] if feats is not None else None)
        self._ids[n0:n0 + k] = ids_arr
        self._cells_host[n0:n0 + k] = cells
        self._fine_host[n0:n0 + k] = fine
        if feats is not None and self._feats_host is not None:
            self._feats_host[n0:n0 + k] = feats
        self._n_host = n0 + k
        self._upload(prev_n=n0)
        self.nb_indexed = self._n_host

    def _plan_capacity(self, n):
        """Global-row capacity for ``n`` occupied rows — the single-chip
        policy (LOPQSearcherTPU._plan_capacity): a size-scaled quantum
        (1M rows past 1M, else 16k) so sizeable indexes do NOT grow on
        every refresh, plus ``capacity_hint`` to size once up front.
        Shared by the host mirror and the per-shard device buffers so
        both grow on the same (expensive) refresh."""
        quantum = (1 << 20) if n >= (1 << 20) else 16384
        return int(round_up(max(n + self.CHUNK_QUANTUM,
                                self.capacity_hint), quantum))

    def _host_reserve(self, n_target, M, D):
        """Capacity-padded host mirror with in-place appends — same
        page-fault economics as the single-chip searcher's mirror
        (LOPQSearcherTPU._host_reserve): a per-append concatenate
        rewrites the whole mirror and cost ~100 s per refresh at 10.5M
        on the dev host. Growth allocates fresh arrays (stale snapshot
        views stay consistent)."""
        n = getattr(self, "_n_host", 0)
        cap_needed = self._plan_capacity(n_target)
        if self._ids is None:
            self._host_capn = cap_needed
            self._ids = np.empty(cap_needed, dtype=object)
            self._cells_host = np.empty(cap_needed, np.int64)
            self._fine_host = np.empty((cap_needed, M), np.uint8)
            if D is not None:
                self._feats_host = np.empty((cap_needed, D), np.float32)
            self._n_host = 0
            return
        if n_target > self._host_capn:
            for name in ("_ids", "_cells_host", "_fine_host",
                         "_feats_host"):
                a = getattr(self, name)
                if a is None:
                    continue
                grown = np.empty((cap_needed,) + a.shape[1:], dtype=a.dtype)
                grown[:n] = a[:n]
                setattr(self, name, grown)
            self._host_capn = cap_needed

    def build(self, coarse, fine, ids=None, feats=None):
        """Bulk (re)build: resets state then appends everything."""
        self.nb_indexed = 0
        self._ids = self._cells_host = self._fine_host = None
        self._feats_host = None
        self._host_capn = 0
        self._n_host = 0
        self._buf_cells = self._buf_fine = self._buf_feats = None
        self._cap_per = 0
        self._n_dev_rows = 0
        self.append(coarse, fine, ids, feats=feats)

    def _upload(self, prev_n):
        """Push rows [prev_n, n) into the device buffers and rebuild CSR.
        Holds the swap lock for the whole mutation: queries snapshot
        under the same lock, so a retry after a donation race blocks
        here until the post-swap dict is visible."""
        with self._swaplock:
            self._upload_locked(prev_n)

    def _upload_locked(self, prev_n):
        V = self.model.V
        n = self._n_host
        n_dev = self.mesh.devices.size
        M = self._fine_host.shape[1]
        sentinel = V * V
        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._ensure_model_dev()

        # Per-shard slice of the shared capacity plan: growth only on a
        # plan change (size-scaled quantum + capacity_hint), never per
        # sizeable append — a [cap_per] change re-uploads every buffer
        # and recompiles every rung program.
        need_per = round_up(-(-self._plan_capacity(n) // n_dev),
                            self.CHUNK_QUANTUM)
        if self._buf_cells is None or need_per > self._cap_per:
            # (Re)allocate capacity buffers prefilled with every row.
            self._cap_per = need_per
            buf_c = np.full((n_dev, self._cap_per), sentinel, np.int32)
            buf_f = np.zeros((n_dev, self._cap_per, M), np.uint8)
            shard_of, slot_of = self._deal(0, n, n_dev)
            buf_c[shard_of, slot_of] = self._cells_host[:n].astype(np.int32)
            buf_f[shard_of, slot_of] = self._fine_host[:n]
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
        if self._feats_host is not None:
            self._upload_feats(prev_n, n, n_dev, sh)
        self._n_dev_rows = n
        # Atomic swap: concurrent queries keep a consistent triple.
        dev = dict(self._dev)
        dev["codes"] = codes
        dev["cell_start"] = cell_start
        dev["order"] = order
        dev["feats"] = self._buf_feats
        # Stale by construction after a refresh: row norms must match the
        # refreshed store (recomputed lazily, _feats_sq_dev), and the
        # occupied-cell count must come from the NEW offsets — the
        # previous dict's values would silently ride along in the copy.
        dev["feats_sq"] = None
        if self._buf_feats is not None:
            # Exact mesh-wide occupied-cell count (a cell counts once even
            # when several shards hold members): the single-chip searcher
            # reports the real count in results metadata; min(nb, V*V) was
            # only an upper bound on sparse indexes.
            dev["n_occ"] = self._n_occ_fn()(cell_start)
        else:
            dev["n_occ"] = None
        self._dev = dev

    def _n_occ_fn(self):
        """Cached mesh program: count cells occupied on >= 1 shard."""
        key = ("nocc",)
        fn = self._qfns.get(key)
        if fn is None:
            def shard_occ(cell_start):
                cs = cell_start[0]
                occ = (cs[1:] > cs[:-1]).astype(jnp.int32)
                tot = jax.lax.psum(occ, SHARD_AXIS)
                return jnp.sum((tot > 0).astype(jnp.int32))

            fn = jax.jit(jax.shard_map(
                shard_occ, mesh=self.mesh,
                in_specs=(P(SHARD_AXIS),), out_specs=P()))
            self._qfns[key] = fn
        return fn

    def _plan_feat_dtype(self, D):
        """Per-shard rerank-store dtype from the CAPACITY plan — the
        single-chip policy (LOPQSearcherTPU._plan_rerank_dtype) applied
        to one shard's [cap_per, D] extent."""
        from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

        return LOPQSearcherTPU._plan_rerank_dtype(
            self.rerank_dtype, self._cap_per, D)

    def _upload_feats(self, prev_n, n, n_dev, sh):
        """Mirror the codes upload for the insertion-order feature store:
        full scatter on (re)build, per-shard donated dynamic_update_slice
        chunks on incremental refresh (no second store-sized copy per
        shard — queries that raced the donation retry on a fresh
        snapshot, see search_batch)."""
        D = self._feats_host.shape[1]
        fdt = self._plan_feat_dtype(D)
        if (self._buf_feats is None
                or self._buf_feats.shape[1] != self._cap_per
                or self._buf_feats.dtype != fdt):
            # Rebuild: drop OUR references to the old store before the new
            # upload so each shard's HBM holds one copy. (A dtype flip only
            # happens when cap_per changed, which is a rebuild anyway.)
            self._buf_feats = None
            if self._dev is not None and self._dev.get("feats") is not None:
                d_old = dict(self._dev)
                d_old["feats"] = None
                d_old["feats_sq"] = None
                self._dev = d_old
            fbuf = np.zeros((n_dev, self._cap_per, D), np.float32)
            shard_of, slot_of = self._deal(0, n, n_dev)
            fbuf[shard_of, slot_of] = self._feats_host[:n]
            self._buf_feats = jax.device_put(fbuf.astype(fdt), sh)
            return
        k = n - prev_n
        if k == 0:
            return
        shard_of, slot_of = self._deal(prev_n, k, n_dev)
        base = self._per_shard_count(prev_n, n_dev)
        per_new = np.bincount(shard_of, minlength=n_dev)
        kq = int(round_up(max(int(per_new.max()), 1), self.CHUNK_QUANTUM))
        chunk = np.zeros((n_dev, kq, D), np.float32)
        chunk[shard_of, slot_of - base[shard_of]] = self._feats_host[prev_n:n]
        offsets = base[:, None].astype(np.int32)

        key = ("fappend", self._cap_per, kq, D, jnp.dtype(fdt).name)
        fn = self._qfns.get(key)
        if fn is None:
            def shard_fappend(buf, chunk, offset):
                b = jax.lax.dynamic_update_slice(
                    buf[0], chunk[0], (offset[0, 0], jnp.int32(0)))
                return b[None]

            # Donated: the per-shard two-copy transient is exactly the
            # OOM class that cost round 4 three debug cycles on the
            # single-chip path; stale-snapshot races retry (search_batch).
            fn = jax.jit(jax.shard_map(
                shard_fappend, mesh=self.mesh,
                in_specs=(P(SHARD_AXIS),) * 3,
                out_specs=P(SHARD_AXIS)), donate_argnums=(0,))
            self._qfns[key] = fn
        self._buf_feats = fn(self._buf_feats,
                             jax.device_put(chunk.astype(fdt), sh),
                             jax.device_put(offsets, sh))

    @staticmethod
    def _per_shard_count(n, n_dev):
        """Occupancy of each shard after n globally-dealt rows."""
        base = np.full(n_dev, n // n_dev, dtype=np.int64)
        base[:n % n_dev] += 1
        return base

    # -------------------------------------------------------------- queries

    def _query_fn(self, V, B, Q, K, R=0, K_out=0, SB=0):
        # Cache compiled fan-out functions per static config — building a
        # fresh shard_map closure per call would miss jax's jit cache.
        # The wave (query-batch) axis is vmapped inside the shard_map, so
        # one compiled program serves any bucketed wave size without
        # retracing the collective layout. ``K_out`` (with R) bounds the
        # rows emitted after the mesh-wide rerank re-sort — serving only
        # consumes ``limit`` rows, so the packed result and its host sync
        # shrink ~R/K_out x (see index/searcher._query_geometry).
        key = (V, B, Q, K, R, K_out, SB)
        cached = self._qfns.get(key)
        if cached is not None:
            return cached
        mesh = self.mesh
        n_dev = mesh.devices.size

        def shard_query(X, Cs, Rs, mus, subs, codes, cell_start, order,
                        quota, *feats):
            # Inside shard_map: X [nq, D] replicated, codes [1, cap, M],
            # cell_start [1, V^2+1], order [1, cap] (sorted position ->
            # in-shard insertion slot), feats [1, cap, D] when reranking.
            def one(x):
                return lopq_query(
                    x, Cs, Rs, mus, subs, codes[0], cell_start[0], quota,
                    V=V, B=B, Q=Q, K=K, SB=SB)

            rows, dists, total, ncells, ok = jax.vmap(one)(X)  # [nq, K] x2
            shard_id = jax.lax.axis_index(SHARD_AXIS)
            slots = order[0][jnp.maximum(rows, 0)]             # [nq, K]
            # global insertion index = slot * n_dev + shard (round-robin)
            rows_g = jnp.where(rows >= 0, slots * n_dev + shard_id, -1)

            def gather_q(a):          # [nq, K] -> [nq, n_dev*K]
                return jnp.moveaxis(
                    jax.lax.all_gather(a, SHARD_AXIS), 0, 1
                ).reshape(rows.shape[0], -1)

            # all_gather the tiny per-query top-k and merge on every shard.
            all_rows = gather_q(rows_g)
            all_dists = gather_q(dists)
            top_neg, top_i = jax.lax.top_k(-all_dists, K)  # [nq, K], by ADC
            m_rows = jnp.take_along_axis(all_rows, top_i, axis=1)
            m_dists = -top_neg
            if R:
                # Device-exact rerank across the mesh: each shard scores
                # its OWN top-K candidates against its local feature
                # shard (exact distances ride the same all_gather as the
                # ADC ones), then the globally-merged top-R-by-ADC set is
                # re-sorted by exact distance — the reference's
                # rerank-and-resort (searcher_lopqhbase.py:862-912) with
                # the feature fetch replaced by shard-local HBM reads.
                cand = feats[0][0][jnp.maximum(slots, 0)]   # [nq, K, D]
                diff = cand - X[:, None, :]
                exact = jnp.sqrt(jnp.sum(diff * diff, axis=2))
                exact = jnp.where(rows >= 0, exact, jnp.inf)
                all_exact = gather_q(exact)
                m_exact = jnp.take_along_axis(
                    all_exact, top_i, axis=1)[:, :R]        # [nq, R]
                r_neg, r_i = jax.lax.top_k(
                    -m_exact, min(K_out, R) if K_out else R)
                m_rows = jnp.take_along_axis(m_rows[:, :R], r_i, axis=1)
                m_rows = jnp.where(jnp.isfinite(r_neg), m_rows, -1)
                m_dists = -r_neg
            # One packed int32 return -> one host sync (see tpu_query
            # pack_query_out). total/ncells are summed across shards (the
            # global candidate count drives probe escalation); grid_ok
            # holds only if EVERY shard's grid restriction was lossless.
            packed = jax.vmap(pack_query_out)(
                m_rows, m_dists,
                jax.lax.psum(total, SHARD_AXIS),
                jax.lax.psum(ncells, SHARD_AXIS),
                jax.lax.psum(1 - ok.astype(jnp.int32), SHARD_AXIS) == 0)
            return packed[None]

        in_specs = (P(), P(), P(), P(), P(), P(SHARD_AXIS), P(SHARD_AXIS),
                    P(SHARD_AXIS), P())
        if R:
            in_specs = in_specs + (P(SHARD_AXIS),)
        fn = jax.jit(jax.shard_map(
            shard_query,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(SHARD_AXIS),
        ))
        self._qfns[key] = fn
        return fn

    def _brute_query_fn(self, Dr, K_pre, K_out):
        """Mesh-wide exact brute search over the sharded feature store:
        each shard streams its own [cap_per, Dr] slice once (bf16-safe
        preselect by ||f||^2 - 2 f.x, f32 re-score of the K_pre
        survivors — same two-stage contract as tpu_query.
        brute_query_batch), all_gathers the per-shard exact top-k, and
        merges. Per-shard top-K_out sets cover the global top-K_out, so
        the merge is exact. This is what makes reranking-ON production
        search exact at scales where one chip cannot hold the feature
        store (100M x 256 f32 = 107 GB -> 13 GB/shard on 8 chips)."""
        key = ("brute", Dr, K_pre, K_out)
        cached = self._qfns.get(key)
        if cached is not None:
            return cached
        mesh = self.mesh
        n_dev = mesh.devices.size

        def shard_brute(X, feats, feats_sq, nglob, n_occ):
            f = feats[0]                          # [cap_per, Dr]
            fsq = feats_sq[0]                     # [cap_per]
            cap = f.shape[0]
            shard_id = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32)
            slots = jnp.arange(cap, dtype=jnp.int32)
            gids = slots * n_dev + shard_id       # global insertion index
            valid = gids < nglob
            kp = min(K_pre, cap)
            ko = min(K_out, kp)
            L = min(8192, cap)
            capL = ((cap + L - 1) // L) * L

            def one_chunk(Xc):                    # [QCH, Dr]
                S = jax.lax.dot_general(
                    Xc.astype(f.dtype), f,
                    (((1,), (1,)), ((), ()))).astype(jnp.float32)
                pre = jnp.where(valid[None, :], fsq[None, :] - 2.0 * S,
                                jnp.inf)
                if capL != cap:
                    pre = jnp.pad(pre, ((0, 0), (0, capL - cap)),
                                  constant_values=jnp.inf)
                pre = pre.reshape(Xc.shape[0], capL // L, L)
                negv, idx = jax.lax.top_k(-pre, min(kp, L))
                gidx = idx + (jnp.arange(capL // L, dtype=jnp.int32)
                              * L)[None, :, None]
                negf, sel = jax.lax.top_k(
                    negv.reshape(Xc.shape[0], -1), kp)
                rows_pre = jnp.take_along_axis(
                    gidx.reshape(Xc.shape[0], -1), sel, axis=1)
                rows_pre = jnp.where(jnp.isfinite(negf), rows_pre, 0)
                cand = f[rows_pre].astype(jnp.float32)
                diff = cand - Xc[:, None, :]
                exact = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
                exact = jnp.where(jnp.isfinite(negf), exact, jnp.inf)
                top_neg, ti = jax.lax.top_k(-exact, ko)
                local_rows = jnp.take_along_axis(rows_pre, ti, axis=1)
                local_rows = jnp.where(jnp.isfinite(top_neg),
                                       gids[local_rows], -1)
                return local_rows, -top_neg       # [QCH, ko] x2

            QCH = min(16, max(X.shape[0], 1))  # pad rows pay full top_k
            pad_q = (-X.shape[0]) % QCH
            Xp = jnp.pad(X.astype(jnp.float32), ((0, pad_q), (0, 0)))
            rows_l, dists_l = jax.lax.map(
                one_chunk, Xp.reshape(-1, QCH, Dr))
            rows_l = rows_l.reshape(-1, ko)[:X.shape[0]]
            dists_l = dists_l.reshape(-1, ko)[:X.shape[0]]

            def gather_q(a):                      # [nq, ko] -> [nq, nd*ko]
                return jnp.moveaxis(
                    jax.lax.all_gather(a, SHARD_AXIS), 0, 1
                ).reshape(rows_l.shape[0], -1)

            all_rows = gather_q(rows_l)
            all_dists = gather_q(jnp.where(rows_l >= 0, dists_l, jnp.inf))
            top_neg, top_i = jax.lax.top_k(-all_dists, K_out)
            m_rows = jnp.take_along_axis(all_rows, top_i, axis=1)
            m_rows = jnp.where(jnp.isfinite(top_neg), m_rows, -1)
            packed = jax.vmap(pack_query_out)(
                m_rows, -top_neg,
                jnp.broadcast_to(nglob.astype(jnp.int32),
                                 (rows_l.shape[0],)),
                jnp.broadcast_to(n_occ.astype(jnp.int32),
                                 (rows_l.shape[0],)),
                jnp.ones((rows_l.shape[0],), jnp.int32))
            return packed[None]

        fn = jax.jit(jax.shard_map(
            shard_brute, mesh=mesh,
            in_specs=(P(), P(SHARD_AXIS), P(SHARD_AXIS), P(), P()),
            out_specs=P(SHARD_AXIS)))
        self._qfns[key] = fn
        return fn

    def _use_brute(self, d, nq, quota, nb, R):
        """Plan choice for a rerank wave — same policy as
        LOPQSearcherTPU._use_brute, with the brute side costed per SHARD
        (each shard streams only its cap_per slice; the grid ladder's
        rung cost is per-shard too, since every shard walks its own
        CSR)."""
        if not R or d.get("feats") is None or self.probe_width:
            return False
        from columbiaimagesearch_tpu.index.tpu_query import (prefer_brute,
                                                             rung_floor)

        ladder = probe_ladder(self.model.V, self.probe_width)
        with self._stats_lock:
            floor = rung_floor(ladder, quota, nb, self.model.V,
                               self._yield_ema)
            # Cost the ACTUAL start rung (see LOPQSearcherTPU._use_brute:
            # a pinned-wide tier hint means the floor under-costs the
            # ladder side).
            start = max(floor, self._tier_hint)
            n_dev = self.mesh.devices.size
            nb_shard = (nb + n_dev - 1) // n_dev
            if start > floor and prefer_brute(ladder[start:], nq, nb_shard,
                                              self.model.V):
                # Keep hint/EMA dynamics alive under a brute takeover
                # (see LOPQSearcherTPU._use_brute).
                self._brute_i += 1
                if self._brute_i % self.REPROBE_EVERY == 0:
                    self._force_reprobe = True
                    return False
                return True
        return prefer_brute(ladder[start:], nq, nb_shard, self.model.V)

    def _feats_sq_dev(self, d):
        """Per-shard row norms^2 of the resident feature store, computed
        once per refresh snapshot (one pass over the store) and cached on
        the snapshot dict."""
        fsq = d.get("feats_sq")
        if fsq is None:
            key = ("fsq",)
            fn = self._qfns.get(key)
            if fn is None:
                def shard_sq(f):
                    ff = f[0].astype(jnp.float32)
                    return jnp.sum(ff * ff, axis=-1)[None]

                fn = jax.jit(jax.shard_map(
                    shard_sq, mesh=self.mesh,
                    in_specs=(P(SHARD_AXIS),),
                    out_specs=P(SHARD_AXIS)))
                self._qfns[key] = fn
            fsq = fn(d["feats"])
            d["feats_sq"] = fsq
        return fsq

    def search_batch(self, X, quota=10, limit=None, rerank_nb=None):
        from columbiaimagesearch_tpu.index.searcher import (
            _retry_stale_snapshot,
        )

        return _retry_stale_snapshot(lambda: self._search_batch_impl(
            X, quota=quota, limit=limit, rerank_nb=rerank_nb))

    def _search_batch_impl(self, X, quota=10, limit=None, rerank_nb=None,
                           _prewarm=False):
        """Fan a wave of queries out to all shards in one launch per probe
        tier; returns a list of ([(id, dist)], cells_visited) per query.

        ``_prewarm=True`` (see :meth:`prewarm_ladder`) drives run_tier
        over EVERY ladder rung for this wave geometry — identical jit
        keys to live traffic — discards results and touches neither the
        probe stats nor the tier hint/yield EMA.

        The wave is padded to a bucketed static batch size (one compile
        per bucket) and insufficient-tier queries escalate through the
        probe ladder, exactly like the single-chip ``search_batch``.
        ``rerank_nb`` (with resident features, see :meth:`append`) fuses
        the mesh-wide exact rerank into the same launch."""
        from columbiaimagesearch_tpu.index.model import LOPQModelPCA
        from columbiaimagesearch_tpu.utils.chunking import wave_bucket

        X = np.asarray(X, dtype=np.float32)
        if X.ndim == 1:
            X = X[None, :]
        if isinstance(self.model, LOPQModelPCA):
            X = self.model.apply_PCA(X)
        nq = len(X)
        nb = self.nb_indexed
        if nb == 0:
            return [([], 0)] * nq

        from columbiaimagesearch_tpu.index.searcher import _query_geometry

        V = self.model.V
        with self._swaplock:
            # Snapshot under the swap lock: blocks while a donating
            # upload is mid-flight, so the one retry in search_batch is
            # guaranteed to see the POST-swap dict (single-chip parity:
            # _snapshot blocks on _mutlock until the pack finishes).
            d = self._dev
            ids_snap = self._ids
        if rerank_nb and d.get("feats") is None:
            raise ValueError(
                "rerank_nb requires a resident feature store "
                "(append(..., feats=...) for every append)")
        # Same geometry as the single-chip paths, with the per-shard
        # candidate budget: each shard scans its own CSR slice, so Q
        # scales with the shard capacity, not the global index size.
        Q_shard = min(round_up(int(quota * 1.5) + 256, 1024),
                      round_up(max(self._cap_per, 256), 256))
        K, Q, K_stage, R, K_emit = _query_geometry(
            quota, limit, max(nb, 1), rerank_nb, Q=Q_shard)

        if not _prewarm and self._use_brute(d, nq, quota, nb, R):
            from columbiaimagesearch_tpu.utils.chunking import pad_rows

            n_dev = self.mesh.devices.size
            Dr = d["feats"].shape[-1]
            fsq = self._feats_sq_dev(d)
            fn = self._brute_query_fn(Dr, R, K_emit)
            Xw, k = pad_rows(X, wave_bucket(nq))
            n_occ = d.get("n_occ")
            if n_occ is None:
                n_occ = jnp.int32(min(nb, V * V))
            packed = fn(jnp.asarray(Xw), d["feats"], fsq,
                        jnp.int32(nb), n_occ)
            packed = np.asarray(packed)[0]
            rows_b, dists_b, _total, ncells_b, _ok = unpack_query_out(
                packed[:k], K_emit)
            with self._stats_lock:
                self.probe_stats["waves"] += 1
                self.probe_stats["brute_waves"] = (
                    self.probe_stats.get("brute_waves", 0) + 1)
            out = []
            for i in range(nq):
                pairs = []
                for r, dist in zip(rows_b[i][:min(K, K_emit)],
                                   dists_b[i][:min(K, K_emit)]):
                    if r < 0 or not np.isfinite(dist):
                        continue
                    pairs.append((ids_snap[int(r)], float(dist)))
                out.append((pairs, int(ncells_b[i])))
            return out

        def run_tier(idx, rung):
            from columbiaimagesearch_tpu.utils.chunking import pad_rows

            B, SB = rung_parts(rung)
            qfn = self._query_fn(V, B, Q, K_stage, R, K_emit, SB)
            Xw, k = pad_rows(X[idx], wave_bucket(len(idx)))
            extra = (d["feats"],) if R else ()
            packed = qfn(
                jnp.asarray(Xw), d["Cs"], d["Rs"], d["mus"],
                d["subs"], d["codes"], d["cell_start"], d["order"],
                jnp.asarray(quota, dtype=jnp.int32), *extra)
            # Every shard returns the same merged top-k; take shard 0's.
            packed = np.asarray(packed)[0]                # one D2H sync
            return unpack_query_out(packed[:k], K_emit if R else K_stage)

        full_ladder = probe_ladder(V, self.probe_width)
        if _prewarm:
            floor = start = 0  # drive every rung; no hint/counter touch
        else:
            # Quota-aware floor + hint/counter updates under the lock
            # (same policy as LOPQSearcherTPU._escalate): concurrent
            # waves must not lose hysteresis updates or skip the
            # periodic re-probe.
            with self._stats_lock:
                floor = rung_floor(full_ladder, quota, nb, V,
                                   self._yield_ema)
                start = min(max(self._tier_hint, floor),
                            len(full_ladder) - 1)
                self._wave_i += 1
                if start > floor and (self._wave_i % self.REPROBE_EVERY
                                      == 0 or self._force_reprobe):
                    start = floor  # periodic re-probe: hint can decay
                self._force_reprobe = False
        # Resident-store-aware per-launch cap (same transient math as
        # LOPQSearcherTPU._wave_cap, per shard: each shard holds its own
        # feats slice and runs its own [nq, Q_shard] rung transients).
        from columbiaimagesearch_tpu.index.searcher import LOPQSearcherTPU

        # Per-shard resident bytes: every sharded buffer's single-shard
        # extent (leading mesh axis = shard axis — shape math only, never
        # slice the sharded array, that would launch a device gather).
        # Counting only the feature store understated residency ~4x at
        # large N (see LOPQSearcherTPU._wave_cap).
        n_dev = self.mesh.devices.size
        seen = set()
        per_shard_bytes = 0
        for a in list(d.values()) + [self._buf_cells, self._buf_fine,
                                     self._buf_feats]:
            if (a is None or not hasattr(a, "shape")
                    or not hasattr(a, "dtype") or id(a) in seen):
                continue
            seen.add(id(a))
            nbytes = int(np.prod(a.shape)) * a.dtype.itemsize
            if a.ndim >= 2 and a.shape[0] == n_dev:
                nbytes //= n_dev
            per_shard_bytes += nbytes
        wrapped = LOPQSearcherTPU._chunk_waves(
            run_tier,
            lambda rung: LOPQSearcherTPU._wave_cap_bytes(
                per_shard_bytes, Q, rung, V))
        if _prewarm:
            from columbiaimagesearch_tpu.utils.chunking import pad_rows

            for rung in full_ladder:
                wrapped(np.arange(nq), rung)
            if R:
                # The brute program is a plan live waves may take once
                # the store is resident; compile it at this geometry.
                fsq = self._feats_sq_dev(d)
                fn = self._brute_query_fn(d["feats"].shape[-1], R, K_emit)
                Xw, _k = pad_rows(X, wave_bucket(nq))
                n_occ = d.get("n_occ")
                if n_occ is None:
                    n_occ = jnp.int32(min(nb, V * V))
                np.asarray(fn(jnp.asarray(Xw), d["feats"], fsq,
                              jnp.int32(nb), n_occ))
            return [([], 0)] * nq
        (rows_b, dists_b, ncells_b, frac_short, settle,
         yield_obs, settled) = escalate_probe(
            wrapped, full_ladder[start:], nq, quota, nb,
            K_emit if R else K_stage)
        with self._stats_lock:
            # Settle-rung hint policy — same as LOPQSearcherTPU._escalate,
            # including the outlier-wave guard (an unsettled wave raises
            # the hint only when the majority actually escalated).
            new_hint = min(start + settle, len(full_ladder) - 1)
            if not settled and frac_short < 0.5:
                new_hint = self._tier_hint
            if start == floor:
                self._tier_hint = new_hint
            elif settle > 0:
                # Escalated past its start: genuine evidence. A wave
                # satisfied AT its start rung is NOT — it must not
                # re-pin a concurrent re-probe's decay via the max()
                # (same policy as LOPQSearcherTPU._escalate, r5 fix).
                self._tier_hint = max(self._tier_hint, new_hint)
            if yield_obs is not None:
                self._yield_ema = (yield_obs if self._yield_ema is None
                                   else 0.7 * self._yield_ema
                                   + 0.3 * yield_obs)
            self.probe_stats["waves"] += 1
            self.probe_stats["escalated_queries"] += int(
                round(frac_short * nq))
            # Same rolling per-wave trace as LOPQSearcherTPU._escalate.
            self.probe_stats.setdefault("wave_log", []).append(
                [start, round(float(frac_short), 3), start + settle, floor,
                 None if self._yield_ema is None
                 else round(float(self._yield_ema), 2)])
            del self.probe_stats["wave_log"][:-64]
        K_out = min(K, K_emit) if R else K
        out = []
        for i in range(nq):
            pairs = []
            for r, dist in zip(rows_b[i][:K_out], dists_b[i][:K_out]):
                if r < 0 or not np.isfinite(dist):
                    continue
                pairs.append((ids_snap[int(r)], float(dist)))
            out.append((pairs, int(ncells_b[i])))
        return out

    def search(self, x, quota=10, limit=None, rerank_nb=None):
        """Fan the query out to all shards; returns ([(id, dist)], cells_visited)."""
        return self.search_batch(np.asarray(x, dtype=np.float32)[None],
                                 quota=quota, limit=limit,
                                 rerank_nb=rerank_nb)[0]


class ShardedLOPQSearcher:
    """LOPQSearcher-compatible facade over :class:`ShardedLOPQIndex`.

    Drop-in index backend for SearcherLOPQ when serving on a multi-chip
    mesh: accumulates code dicts, rebuilds the sharded CSR lazily, and
    returns the same Result tuples as the single-chip searchers.
    """

    def __init__(self, model, mesh=None, probe_width=None,
                 rerank_dtype="auto", capacity_hint=0):
        self.model = model
        self.index = ShardedLOPQIndex(model, mesh=mesh,
                                      probe_width=probe_width,
                                      rerank_dtype=rerank_dtype,
                                      capacity_hint=capacity_hint)
        import threading

        from columbiaimagesearch_tpu.utils.codes import IncrementalDedup

        self._parts = []  # pending (coarse [n,2] int32, fine [n,M], ids obj)
        self._dirty = False
        self._dedup = IncrementalDedup()
        self._mutlock = threading.RLock()
        self.nb_indexed = 0

    @property
    def probe_stats(self):
        """Ladder observability, delegated to the sharded index so
        SearcherLOPQ.status() finds it on the facade too."""
        return self.index.probe_stats

    @property
    def _tier_hint(self):
        return self.index._tier_hint

    def add_codes(self, codes, ids=None, feats=None):
        """Array-path insertion: codes is (coarse [n,2], fine [n,M]);
        ``feats`` optionally keeps index-space features resident for
        device reranking (see ShardedLOPQIndex.append)."""
        from columbiaimagesearch_tpu.utils.codes import ids_to_object_array

        coarse, fine = codes
        coarse = np.asarray(coarse, dtype=np.int32)
        fine = np.asarray(fine, dtype=np.int32)
        n = len(coarse)
        ids_arr = (np.arange(n, dtype=object) if ids is None
                   else ids_to_object_array(ids, n))
        if feats is not None:
            feats = np.ascontiguousarray(feats, dtype=np.float32)
        with self._mutlock:
            self._parts.append((coarse, fine, ids_arr, feats))
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
            self._parts.append((coarse, fine, ids, None))
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
            feats = (np.concatenate([p[3] for p in self._parts])
                     if all(p[3] is not None for p in self._parts)
                     else None)
            self._parts = []
            # Exact first-insertion dedup, incremental: only the PENDING
            # rows are hashed (interned id table + sorted key set persist
            # across refreshes), then only survivors reach the device.
            cells = (coarse[:, 0].astype(np.int64) * self.model.V
                     + coarse[:, 1].astype(np.int64))
            keep = self._dedup.filter_new(cells, ids)
            if not keep.all():
                coarse, fine, ids = coarse[keep], fine[keep], ids[keep]
                if feats is not None:
                    feats = feats[keep]
            if len(ids):
                self.index.append(coarse, fine, ids, feats=feats)
            self.nb_indexed = self.index.nb_indexed
            self._dirty = False

    @property
    def has_rerank_feats(self):
        self._maybe_build()
        return self.index.has_rerank_feats

    def prewarm_ladder(self, quota=10, limit=None, rerank_nb=None,
                       waves=(1,)):
        """Sharded twin of :meth:`LOPQSearcherTPU.prewarm_ladder`:
        force-compile every ladder rung program (plus the mesh brute
        plan when the store is resident) for the serving geometry at
        each wave bucket — a live query settling on a rung the synthetic
        warm-up request never visited otherwise pays a mid-request
        compile. Results are discarded; probe stats and the tier hint
        are untouched. Returns the number of rung programs driven."""
        from columbiaimagesearch_tpu.index.tpu_query import probe_ladder
        from columbiaimagesearch_tpu.utils.chunking import wave_bucket

        self._maybe_build()
        idx = self.index
        if idx.nb_indexed == 0:
            return 0
        if rerank_nb and not idx.has_rerank_feats:
            rerank_nb = None
        model = self.model
        # _search_batch_impl applies PCA itself, so prewarm feeds
        # ORIGINAL-dim zeros for PCA models; pca_P can legitimately be
        # None on an LOPQModelPCA built without projection params
        # (model.py:419) — guard like the single-chip twin does.
        pca_P = getattr(model, "pca_P", None)
        D = (pca_P.shape[0] if pca_P is not None
             else model.Cs[0].shape[1] * 2)
        n_rungs = len(probe_ladder(model.V, idx.probe_width))
        n = 0
        for w in sorted({wave_bucket(max(1, int(b))) for b in waves}):
            X = np.zeros((w, D), np.float32)
            idx._search_batch_impl(X, quota=quota, limit=limit,
                                   rerank_nb=rerank_nb, _prewarm=True)
            n += n_rungs + (1 if rerank_nb else 0)
        return n

    @staticmethod
    def _to_results(pairs, with_dists):
        from columbiaimagesearch_tpu.index.searcher import Result, ResultDist

        if with_dists:
            return [ResultDist(rid, None, dist) for rid, dist in pairs]
        return [Result(rid, None) for rid, dist in pairs]

    def search(self, x, quota=10, limit=None, with_dists=False,
               rerank_nb=None):
        self._maybe_build()
        if self.nb_indexed == 0:
            return [], 0
        pairs, visited = self.index.search(x, quota=quota, limit=limit,
                                           rerank_nb=rerank_nb)
        return self._to_results(pairs, with_dists), visited

    def search_batch(self, X, quota=10, limit=None, with_dists=False,
                     with_codes=False, rerank_nb=None):
        """Wave-batched mesh queries (same contract as the single-chip
        ``LOPQSearcherTPU.search_batch``; codes are never materialized on
        the sharded backend, so ``with_codes`` is accepted and ignored)."""
        del with_codes  # sharded results always carry code=None
        self._maybe_build()
        if self.nb_indexed == 0:
            return [([], 0)] * len(X)
        waves = self.index.search_batch(X, quota=quota, limit=limit,
                                        rerank_nb=rerank_nb)
        return [(self._to_results(pairs, with_dists), visited)
                for pairs, visited in waves]
