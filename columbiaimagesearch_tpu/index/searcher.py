"""LOPQ searchers: a host parity searcher and the TPU CSR searcher.

``LOPQSearcher`` keeps the reference's in-RAM dict-of-cells index and exact
query semantics (reference: lopq/lopq/search.py:85-382) — it is the oracle the
TPU path is validated against and the fallback for tiny indexes.

``LOPQSearcherTPU`` is the production path: PQ codes packed into a CSR layout
(sorted by cell id + offsets table) resident in device HBM, queried by the
fused static-shape kernel in tpu_query.py. It plays the role of the
reference's ``LOPQSearcherLMDB`` (reference: lopq/lopq/search.py:385-499) with
device memory instead of LMDB pages.
"""

import threading
import time
from collections import defaultdict, namedtuple
from itertools import count

import numpy as np

from columbiaimagesearch_tpu.index.model import LOPQCode, LOPQModelPCA
from columbiaimagesearch_tpu.index.multisequence import multisequence
from columbiaimagesearch_tpu.utils.chunking import pad_rows, round_up
from columbiaimagesearch_tpu.utils.codes import (
    IncrementalDedup,
    code_dtype_for,
    ids_to_object_array,
)

Result = namedtuple("Result", ["id", "code"])
ResultDist = namedtuple("Result", ["id", "code", "dist"])


def _pyid(v):
    """Unbox numpy scalars at result assembly so Result.id is always a
    plain Python value: default identity ids live in an int64 arange (no
    object boxing at 100M scale, see _normalize_codes), but consumers
    json.dumps results and expect ``int`` — and the sharded searcher's
    object-dtype defaults already return Python ints."""
    return v.item() if isinstance(v, np.generic) else v


def _codes_to_arrays(codes, ids, V, S):
    """Normalize codes input: iterable of LOPQCode tuples or array pair."""
    if isinstance(codes, tuple) and len(codes) == 2 and hasattr(codes[0], "ndim"):
        coarse, fine = codes
        coarse = np.asarray(coarse)
        fine = np.asarray(fine)
    else:
        codes = list(codes)
        coarse = np.asarray([c[0] for c in codes], dtype=code_dtype_for(V))
        fine = np.asarray([c[1] for c in codes], dtype=code_dtype_for(S))
    n = coarse.shape[0]
    if ids is None:
        # Identity ids stay an int64 arange — boxing 100M row indices
        # into an object array costs ~3.6 GB and tens of seconds; numpy
        # int ids concatenate fine with object arrays from later
        # explicit-id adds.
        ids_arr = np.arange(n)
    else:
        ids_arr = ids_to_object_array(ids, n)
    return coarse, fine, ids_arr


def _query_geometry(quota, limit, nb, rerank_nb, Q=None):
    """Shared device-query shape math for the single-chip paths.

    ``limit`` is the OUTPUT size the caller consumes; ``rerank_nb`` the
    exact-rerank depth. The ADC stage must keep max(limit, rerank_nb)
    rows (K_stage) so the re-sort sees the full depth, but the kernel
    emits only K_emit rows — serving at limit=100/rerank_nb=1000 moves
    ~10x less data device-to-host and runs a 10x smaller exact top-k.

    :returns: (K requested output rows, Q candidate budget,
        K_stage ADC top-k depth, R rerank depth (0 = off),
        K_emit packed rows per query)
    """
    K = min(limit if limit is not None else quota, nb)
    if Q is None:
        Q = min(round_up(int(quota) + 1024, 1024), round_up(nb, 256))
    if rerank_nb:
        K_stage = min(round_up(max(K, int(rerank_nb)), 16), Q)
        R = min(int(rerank_nb), K_stage)
        K_emit = min(round_up(K, 16), R)
    else:
        K_stage = min(round_up(K, 16), Q)
        R, K_emit = 0, K_stage
    return K, Q, K_stage, R, K_emit


def _pack_trace(label, t0, arrs=None):
    """Opt-in stage timing for the refresh path (CIS_PACK_TIMING=1):
    blocks on ``arrs`` so each stage's device time lands in its own
    bucket, then prints the split. Diagnostic only — blocking per stage
    serializes work the async dispatch would overlap."""
    import os
    import sys
    import time

    if not os.environ.get("CIS_PACK_TIMING"):
        return time.perf_counter()
    if arrs:
        import jax

        jax.block_until_ready([a for a in arrs if a is not None])
    t1 = time.perf_counter()
    print(f"[pack] {label}: {t1 - t0:.3f}s", file=sys.stderr, flush=True)
    return t1


def _retry_stale_snapshot(fn):
    """Run a query body; retry ONCE on a fresh snapshot if it raced a
    donating refresh. Refreshes donate the rerank store buffer
    (csr.append_rows) to avoid a second store-sized device copy; a query
    thread that snapshotted just before the donation then launches with
    an invalidated handle and jax raises. The body re-snapshots on entry,
    so one retry always sees consistent post-refresh buffers."""
    try:
        return fn()
    except RuntimeError as e:
        msg = str(e).lower()
        if "deleted" not in msg and "donated" not in msg:
            raise
        return fn()


_HBM_LIMIT = None


def hbm_bytes_limit(default=15.75e9):
    """Per-device HBM size, from the runtime when it reports one.

    ``memory_stats()`` is the source of truth on TPU backends (a v5e
    reports ~15.75e9 ``bytes_limit``); the CPU backend reports host RAM
    or nothing, so anything implausibly large or missing falls back to
    the v5e constant — the HBM-budget heuristics below were measured
    there and a 125 GB "budget" would disable them in CPU tests."""
    global _HBM_LIMIT
    if _HBM_LIMIT is None:
        limit = 0.0
        try:
            import jax

            dev = jax.local_devices()[0]
            if dev.platform == "tpu":
                stats = dev.memory_stats() or {}
                limit = float(stats.get("bytes_limit", 0.0))
        except Exception:
            limit = 0.0
        _HBM_LIMIT = limit if 1e9 < limit < 256e9 else default
    return _HBM_LIMIT


_ROW_NORMS_SQ = None


def _row_norms_sq(f):
    """Fused per-row ||f||^2 over the rerank store, as ONE jitted
    program: XLA folds the dtype convert + square into the row
    reduction, so peak HBM is input + [n] output. (Evaluated eagerly,
    ``f * f`` materializes a store-sized intermediate — 11.8 GB at
    10.5M x 256 f32, an OOM on a 16 GB chip.)"""
    global _ROW_NORMS_SQ
    if _ROW_NORMS_SQ is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(x):
            return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1)

        _ROW_NORMS_SQ = fn
    return _ROW_NORMS_SQ(f)


class LOPQSearcherBase(object):
    def __init__(self):
        self.nb_indexed = 0
        self.verbose = 0

    def get_nb_indexed(self):
        return self.nb_indexed

    def add_data(self, data, ids=None, num_procs=1):
        """Encode raw vectors on device and index them.

        The reference shards this over a multiprocessing pool
        (lopq/lopq/search.py:94-108 + utils.py:178-200); here one batched
        ``predict_batch`` call replaces the pool.
        """
        del num_procs  # device batching replaces host process parallelism
        coarse, fine = self.model.predict_batch(data)
        self.add_codes((coarse, fine), ids)

    def add_codes_from_dict(self, codes_dict):
        ids = list(codes_dict.keys())
        codes = [codes_dict[k] for k in ids]
        self.add_codes(codes, ids)

    def get_result_quota(self, x, quota=10):
        """Probe multi-index cells in distance order until quota is covered
        (reference: lopq/lopq/search.py:110-135)."""
        retrieved = []
        visited = 0
        for _, cell in multisequence(x, self.model.Cs):
            retrieved += self.get_cell(cell)
            visited += 1
            if len(retrieved) >= quota:
                break
        return retrieved, visited

    def compute_distances(self, x, items):
        """ADC distances with per-coarse-cluster LUT memoization
        (reference: lopq/lopq/search.py:137-177)."""
        memo = [{}, {}]

        def luts(coarse):
            c0, c1 = int(coarse[0]), int(coarse[1])
            if c0 not in memo[0]:
                memo[0][c0] = self.model.get_subquantizer_distances(
                    x, coarse, coarse_split=0)
            if c1 not in memo[1]:
                memo[1][c1] = self.model.get_subquantizer_distances(
                    x, coarse, coarse_split=1)
            return memo[0][c0] + memo[1][c1]

        results = []
        for item in items:
            coarse, fine = item[1]
            tables = luts(coarse)
            dist = sum(tables[i][fc] for i, fc in enumerate(fine))
            results.append((dist, item))
        return results

    def search(self, x, quota=10, limit=None, with_dists=False):
        """Rank the probed candidates by ADC distance
        (reference: lopq/lopq/search.py:179-224)."""
        if isinstance(self.model, LOPQModelPCA):
            x = self.model.apply_PCA(x)

        retrieved, visited = self.get_result_quota(x, quota)
        results = self.compute_distances(x, retrieved)
        results = sorted(results, key=lambda d: d[0])
        if limit is None:
            limit = quota
        results = results[:limit]

        if with_dists:
            out = [ResultDist(item[0], item[1], d) for d, item in results]
        else:
            out = [Result(item[0], item[1]) for d, item in results]
        return out, visited

    def add_codes(self, codes, ids=None):
        raise NotImplementedError()

    def get_cell(self, cell):
        raise NotImplementedError()


class LOPQSearcher(LOPQSearcherBase):
    """In-RAM dict index, duplicate-id-per-cell insertion skipped
    (reference: lopq/lopq/search.py:310-382)."""

    def __init__(self, model):
        super().__init__()
        self.model = model
        self.index = defaultdict(list)
        self._cell_ids = defaultdict(set)

    def add_codes(self, codes, ids=None):
        if ids is None:
            ids = count()
        if isinstance(codes, tuple) and len(codes) == 2 and hasattr(codes[0], "ndim"):
            coarse, fine = codes
            codes = [LOPQCode(tuple(c), tuple(f)) for c, f in zip(coarse, fine)]
        for item_id, code in zip(ids, codes):
            cell = tuple(int(c) for c in code[0])
            if item_id in self._cell_ids[cell]:
                continue
            self.index[cell].append((item_id, code))
            self._cell_ids[cell].add(item_id)
            self.nb_indexed += 1

    def get_cell(self, cell):
        cell = tuple(int(c) for c in cell)
        return self.index[cell]


class LOPQSearcherTPU(LOPQSearcherBase):
    """HBM-resident CSR multi-index with a fused on-device query.

    The incremental-append role of the reference's LMDB index, redesigned
    device-first: codes live in capacity-padded device buffers in insertion
    order; each refresh uploads ONLY the newly appended rows and rebuilds
    the cell-sorted CSR view on device (sort + gather + offsets as XLA ops,
    csr.append_and_build_csr). Host keeps insertion-order copies for result
    reconstruction and a sorted key array for exact first-insertion dedup.
    """

    #: appended chunks are sentinel-padded to this multiple so refreshes
    #: reuse one compiled append program
    CHUNK_QUANTUM = 8192
    # Above this capacity, incremental refreshes use the linear merge
    # (csr.merge_append_csr) instead of re-sorting the whole buffer.
    MERGE_REFRESH_MIN_CAP = 32 << 20

    #: HBM headroom (bytes) the rerank store must leave free: code
    #: buffers + CSR view, the append chunk, wave transients (the wave
    #: cap adapts to the store, but needs a working floor), and XLA
    #: scratch. Appends are donated (csr.append_rows) so the store is
    #: budgeted at ONE copy — the r04 two-copy transient (2 x 11.8 GB at
    #: 10.5M x 256 f32 on a 15.75 GB chip) is gone; queries that raced a
    #: donation retry on a fresh snapshot (see search_batch).
    RERANK_HEADROOM_BYTES = 2.25e9

    @classmethod
    def rerank_f32_budget(cls):
        """Bytes available to a float32 rerank store before "auto" falls
        back to bfloat16 (15.75e9 - 2.25e9 = 13.5e9 on v5e — the r04
        measured-safe budget)."""
        return hbm_bytes_limit() - cls.RERANK_HEADROOM_BYTES

    @classmethod
    def _plan_rerank_dtype(cls, rerank_dtype, cap, Dr):
        """Device dtype of the rerank store, decided from the CAPACITY
        plan (not the current row count): the decision changes only when
        ``cap`` changes, and capacity growth is already a full rebuild,
        so no append ever triggers a dtype-flip rebuild on its own.
        Budgeted at ONE store copy — appends are donated in-place."""
        import jax.numpy as jnp

        if rerank_dtype == "bfloat16":
            return jnp.bfloat16
        if (rerank_dtype == "auto"
                and 4 * cap * Dr > cls.rerank_f32_budget()):
            return jnp.bfloat16
        return jnp.float32

    def __init__(self, model, probe_width=None, codestore_path=None,
                 rerank_dtype="auto", capacity_hint=0):
        super().__init__()
        self.model = model
        self.probe_width = probe_width
        #: expected index size (rows). Capacity growth is the expensive
        #: refresh event — a [cap] shape change re-uploads every buffer
        #: AND recompiles every rung program (30-300 s each through a
        #: remote-compile relay). Sizing the buffers once up front makes
        #: every later refresh an in-place donated append.
        self.capacity_hint = int(capacity_hint)
        #: device dtype for the resident rerank feature matrix. "float32"
        #: is exact; "bfloat16" halves HBM (the 10M x 256-d store drops
        #: from ~11.8 GB to ~5.9 GB) at ~1e-3 relative distance error
        #: (the brute/rerank preselect is bf16 regardless; the f32
        #: re-score then reads bf16-rounded stored values). "auto"
        #: (default) picks float32 while ONE store copy fits in
        #: rerank_f32_budget(), bfloat16 beyond (appends are donated
        #: in-place, so the store is never duplicated on device).
        self.rerank_dtype = rerank_dtype
        self._pending = []  # list of (cells int64 [n], fine uint8 [n, M],
        #                     ids, feats float32 [n, D] or None)
        # Host mirror, kept in CAPACITY-padded arrays written in place:
        # appends write only rows past the previous count, so they cost
        # O(new rows) — a per-append np.concatenate rewrites the whole
        # mirror (10.7 GB at 10.5M x 256), which alone cost ~100 s per
        # 8k-row refresh on the page-fault-bound dev host (r04's 123 s
        # "refresh"). Rows past _n_host are uninitialized.
        self._host_cap = 0
        self._n_host = 0
        self._cells = None  # int64 [host_cap], INSERTION order
        self._fine = None   # uint8 [host_cap, M], insertion order
        self._ids = None    # int64 [host_cap] while every add used
        #                     identity ids; object [host_cap] after the
        #                     first explicit-id add (one-time convert)
        self._feats = None  # float32 [host_cap, D] index-space rerank
        #                     features (None when any add omitted them)
        self._dedup = IncrementalDedup()
        self._buf_cells = None  # device [cap] int32, sentinel-padded
        self._buf_fine = None   # device [cap, M] uint8
        self._buf_feats = None  # device [cap, D] rerank features
        self._cap = 0
        self._n_dev = 0     # occupied device rows
        self._dev = None    # codes/cell_start/order + model tables
        self._dirty = True
        # Serving refreshes run concurrently with queries (threaded API +
        # background load_codes): mutations hold this lock, and queries
        # snapshot (_dev, ids, cells, fine) atomically so a mid-query
        # repack can't mix old offsets with new codes. Appends write only
        # PAST the rows a stale snapshot's [:n] views cover (and capacity
        # growth allocates fresh arrays), so a stale snapshot is always
        # internally consistent.
        self._mutlock = threading.RLock()
        self._tier_hint = 0  # probe-ladder start rung (see _escalate)
        self._wave_i = 0
        self._brute_i = 0          # hint-driven brute waves (see _use_brute)
        self._force_reprobe = False
        #: EMA of candidates-per-visited-cell at real quota crossings;
        #: None until the first satisfied wave (rung_floor then falls
        #: back to the uniform-occupancy prior nb/V^2).
        self._yield_ema = None
        #: serving observability (surfaced via /status): waves served,
        #: queries that needed escalation past their wave's start rung,
        #: current tier hint.
        self.probe_stats = {"waves": 0, "escalated_queries": 0}
        self._codestore = None
        if codestore_path is not None:
            # Durable native store (native/codestore.cpp): appends persist,
            # restarts reload the sorted records in one pass.
            from columbiaimagesearch_tpu.native import CodeStore

            self._codestore = CodeStore(codestore_path, m=model.M)
            if len(self._codestore):
                cells, fine, ids = self._codestore.read_all()
                ids_arr = np.empty(len(ids), dtype=object)
                ids_arr[:] = ids
                self._pending.append(
                    (cells.astype(np.int64), fine, ids_arr, None))

    def get_nb_indexed(self):
        self._pack()
        return self.nb_indexed

    # ------------------------------------------------------------- indexing

    def _plan_capacity(self, n):
        """Capacity (rows) for ``n`` occupied rows — shared by the host
        mirror and the device buffers so both grow on the same refresh
        (growth is the expensive event: full re-upload + rung-program
        recompiles; ``capacity_hint`` sizes it once for production)."""
        quantum = (1 << 20) if n >= (1 << 20) else 16384
        return round_up(max(n + self.CHUNK_QUANTUM, self.capacity_hint),
                        quantum)

    def _host_reserve(self, n_target, M, D, ids_obj=False):
        """Ensure the host capacity mirror holds ``n_target`` rows.

        Growth allocates FRESH arrays and copies the occupied prefix —
        stale snapshot views keep their old base buffers, so concurrent
        readers stay consistent. ``ids_obj`` upgrades the ids mirror from
        the identity int64 fast path to object dtype (one-time boxing;
        see _codes_to_arrays for why identity ids avoid object arrays)."""
        n = self._n_host
        if self._cells is None:
            self._host_cap = self._plan_capacity(n_target)
            self._cells = np.empty(self._host_cap, np.int64)
            self._fine = np.empty((self._host_cap, M), np.uint8)
            self._ids = np.empty(self._host_cap,
                                 dtype=object if ids_obj else np.int64)
            if D is not None:
                self._feats = np.empty((self._host_cap, D), np.float32)
            return
        if n_target > self._host_cap:
            cap = self._plan_capacity(n_target)
            for name in ("_cells", "_fine", "_ids", "_feats"):
                a = getattr(self, name)
                if a is None:
                    continue
                grown = np.empty((cap,) + a.shape[1:], dtype=a.dtype)
                grown[:n] = a[:n]
                setattr(self, name, grown)
            self._host_cap = cap
        if ids_obj and self._ids.dtype != object:
            up = np.empty(self._host_cap, dtype=object)
            up[:n] = self._ids[:n]
            self._ids = up
        if D is not None and self._feats is None and n == 0:
            self._feats = np.empty((self._host_cap, D), np.float32)

    def add_codes(self, codes, ids=None, feats=None):
        """Index codes; optionally store the matching index-space features
        for device-resident exact reranking (``feats`` [n, D], same row
        order — post-PCA space for lopq_pca models). Reranking stays
        enabled only while EVERY add supplies features: one featureless
        add drops the store and reranking falls back to the host/indexer
        path (searcher_lopq._rank_results)."""
        coarse, fine, ids_arr = _codes_to_arrays(
            codes, ids, self.model.V, self.model.subquantizer_clusters)
        cells = (coarse[:, 0].astype(np.int64) * self.model.V
                 + coarse[:, 1].astype(np.int64))
        if feats is not None:
            feats = np.ascontiguousarray(feats, dtype=np.float32)
            if len(feats) != len(cells):
                raise ValueError(
                    f"feats rows {len(feats)} != codes rows {len(cells)}")
        with self._mutlock:
            self._pending.append((cells, fine.astype(np.uint8), ids_arr,
                                  feats))
            if self._codestore is not None:
                self._codestore.append(cells.astype(np.uint32),
                                       fine.astype(np.uint8),
                                       [str(i) for i in ids_arr])
                self._codestore.sync()
            self._dirty = True

    def add_data(self, data, ids=None, num_procs=1, store_feats=False):
        """Encode + index raw vectors; with ``store_feats`` the index-space
        projection is kept resident for device reranking."""
        del num_procs
        data = np.asarray(data, dtype=np.float32)
        coarse, fine = self.model.predict_batch(data)
        feats = None
        if store_feats:
            feats = (self.model.apply_PCA(data)
                     if isinstance(self.model, LOPQModelPCA) else data)
        self.add_codes((coarse, fine), ids, feats=feats)

    @property
    def has_rerank_feats(self):
        """True when the device feature store covers every indexed row."""
        with self._mutlock:
            self._pack_locked()
            return self._feats is not None and self.nb_indexed > 0

    def _pack(self):
        with self._mutlock:
            self._pack_locked()

    #: At/above this coarse-codebook size the dense [V^2+1] offsets table
    #: (268 MB at V=8192, 1 GB at V=16384) is replaced by searchsorted
    #: lookups over the sorted cell-id array (tpu_query wide-V mode) —
    #: O(cap) memory, ~log2(N) extra gather passes per query. Below it the
    #: dense table stays (measured fastest at the production V=4096).
    WIDE_V_THRESHOLD = 8192

    def _pack_locked(self):
        if not self._dirty:
            return
        t = time.perf_counter()
        V = self.model.V
        if V > 46340:
            # Cell ids c0*V + c1 live in int32 buffers (and V*V is the
            # empty-slot sentinel); past floor(sqrt(2^31-1)) they would
            # wrap silently. The reference caps far below this too (its
            # production V is 4096).
            raise ValueError(
                f"V={V}: cell ids (V^2) exceed int32; max supported V "
                "is 46340")
        if self._pending:
            cells_new = np.concatenate([p[0] for p in self._pending])
            fine_new = np.concatenate([p[1] for p in self._pending])
            ids_new = np.concatenate([p[2] for p in self._pending])
            # The rerank feature store survives only while every add (past
            # and pending) supplied features — a single gap would make
            # device "exact" distances silently wrong for those rows.
            feats_ok = (all(p[3] is not None for p in self._pending)
                        and (self._n_host == 0 or self._feats is not None))
            feats_new = (np.concatenate([p[3] for p in self._pending])
                         if feats_ok else None)
            self._pending = []
            keep = self._dedup.filter_new(cells_new, ids_new)
            if not keep.all():
                cells_new = cells_new[keep]
                fine_new = fine_new[keep]
                ids_new = ids_new[keep]
                if feats_new is not None:
                    feats_new = feats_new[keep]
            if not feats_ok and self._feats is not None:
                self._feats = None
                self._buf_feats = None  # free ~cap*D*4 bytes of HBM
            k = len(cells_new)
            if k:
                # In-place append into the capacity mirror: O(k) host
                # work (see the _host_cap field comment for why a
                # concatenate here cost ~100 s per refresh at 10.5M).
                self._host_reserve(
                    self._n_host + k, fine_new.shape[1],
                    feats_new.shape[1] if feats_new is not None else None,
                    ids_obj=ids_new.dtype == object)
                n0 = self._n_host
                self._cells[n0:n0 + k] = cells_new
                self._fine[n0:n0 + k] = fine_new
                self._ids[n0:n0 + k] = ids_new
                if feats_new is not None and self._feats is not None:
                    self._feats[n0:n0 + k] = feats_new
                self._n_host = n0 + k
        n = self._n_host
        self.nb_indexed = n
        t = _pack_trace("host_merge", t)
        if n == 0:
            self._dirty = False
            return

        import jax.numpy as jnp

        from columbiaimagesearch_tpu.index.csr import (
            append_and_build_csr,
            merge_append_csr,
        )

        if self._dev is None:
            # Model parameters are immutable for the life of the searcher —
            # upload once (Rs alone is V*D^2*2 floats, ~540 MB at the
            # production config; re-shipping it per refresh dominated the
            # repack cost).
            self._dev = {
                "Cs": jnp.stack([jnp.asarray(C) for C in self.model.Cs]),
                "Rs": jnp.stack([jnp.asarray(R) for R in self.model.Rs]),
                "mus": jnp.stack([jnp.asarray(m) for m in self.model.mus]),
                "subs": jnp.stack(
                    [jnp.stack([jnp.asarray(s) for s in half])
                     for half in self.model.subquantizers]),
            }
            if isinstance(self.model, LOPQModelPCA):
                # For the fused device serving path (search_device_feats):
                # PCA happens on device, features never visit the host.
                self._dev["pca_P"] = jnp.asarray(self.model.pca_P)
                self._dev["pca_mu"] = jnp.asarray(self.model.pca_mu)

        M = self._fine.shape[1]
        sentinel = V * V
        need_cap = self._plan_capacity(n)
        if self._buf_cells is None or need_cap > self._cap:
            # (Re)build: allocate capacity buffers prefilled with every row.
            self._cap = need_cap
            buf_c = np.full(self._cap, sentinel, np.int32)
            buf_c[:n] = self._cells[:n].astype(np.int32)
            buf_f = np.zeros((self._cap, M), np.uint8)
            buf_f[:n] = self._fine[:n]
            self._buf_cells = jnp.asarray(buf_c)
            self._buf_fine = jnp.asarray(buf_f)
            chunk_c = np.full(self.CHUNK_QUANTUM, sentinel, np.int32)
            chunk_f = np.zeros((self.CHUNK_QUANTUM, M), np.uint8)
            offset = n
            use_merge = False  # fresh buffers: previous sorted view is stale
            feat_rebuild = True
        else:
            # Incremental: upload ONLY the new rows (sentinel-padded chunk).
            k = n - self._n_dev
            if k == 0:  # everything deduped away; device view unchanged
                self._dirty = False
                return
            k_pad = round_up(k, self.CHUNK_QUANTUM)
            chunk_c = np.full(k_pad, sentinel, np.int32)
            chunk_c[:k] = self._cells[self._n_dev:n].astype(np.int32)
            chunk_f = np.zeros((k_pad, M), np.uint8)
            chunk_f[:k] = self._fine[self._n_dev:n]
            offset = self._n_dev
            # The linear merge beats the full re-sort only once the sort's
            # O(N log^2 N) bites (measured: sort 1.4 s vs merge 1.8 s at
            # 10.5M, but ~65 s vs ~13 s at 100M on v5e).
            use_merge = (self._dev.get("cells_sorted") is not None
                         and self._cap > self.MERGE_REFRESH_MIN_CAP)
            feat_rebuild = False
        wide = V >= self.WIDE_V_THRESHOLD
        if use_merge:
            # Steady-state refresh: linear merge of the sorted chunk into
            # the previous sorted view (no full re-sort; see
            # csr.merge_append_csr — the argsort path cost ~60 s per
            # refresh at a 100M-row index).
            (self._buf_cells, self._buf_fine, cells_sorted, codes,
             cell_start, order) = merge_append_csr(
                self._buf_cells, self._buf_fine, self._dev["cells_sorted"],
                self._dev["codes"], self._dev["order"],
                self._dev["cell_start"], jnp.asarray(chunk_c),
                jnp.asarray(chunk_f), jnp.int32(offset), V, wide=wide)
        else:
            (self._buf_cells, self._buf_fine, cells_sorted, codes,
             cell_start, order) = append_and_build_csr(
                self._buf_cells, self._buf_fine, jnp.asarray(chunk_c),
                jnp.asarray(chunk_f), jnp.int32(offset), V, wide=wide)
        t = _pack_trace("csr_build", t,
                        (self._buf_cells, cells_sorted, codes, cell_start,
                         order))
        # Rerank feature store: insertion-order rows, so it never takes
        # part in the CSR sort — a rebuild uploads the whole padded matrix,
        # an incremental refresh slices in only the new rows.
        if self._feats is not None:
            from columbiaimagesearch_tpu.index.csr import append_rows

            Dr = self._feats.shape[1]
            fdt = self._plan_rerank_dtype(self.rerank_dtype, self._cap, Dr)
            if (self._buf_feats is not None
                    and self._buf_feats.dtype != fdt):
                # Dtype flips only when the CAPACITY plan changed, and a
                # capacity change is already a full rebuild — so a flip
                # never forces a rebuild that wasn't happening anyway.
                self._buf_feats = None
            if feat_rebuild or self._buf_feats is None:
                # Rebuild: drop OUR references to the old store before
                # uploading the new one so HBM holds one copy (in-flight
                # query snapshots may still pin the old buffer briefly).
                self._buf_feats = None
                if self._dev.get("feats") is not None:
                    d_old = dict(self._dev)
                    d_old["feats"] = None
                    d_old["feats_sq"] = None
                    self._dev = d_old
                fbuf = np.zeros((self._cap, Dr), np.float32)
                fbuf[:n] = self._feats[:n]
                self._buf_feats = jnp.asarray(fbuf, dtype=fdt)
            else:
                k = n - offset
                k_pad = round_up(k, self.CHUNK_QUANTUM)
                fchunk = np.zeros((k_pad, Dr), np.float32)
                fchunk[:k] = self._feats[offset:n]
                # Donated in-place slice: the store is never duplicated
                # on device (the old handle is invalidated — stale query
                # snapshots retry, see search_batch).
                self._buf_feats = append_rows(
                    self._buf_feats, jnp.asarray(fchunk, dtype=fdt),
                    jnp.int32(offset))
            t = _pack_trace("feats_store", t, (self._buf_feats,))
        self._n_dev = n
        # Atomic swap: in-flight queries holding the previous dict keep a
        # consistent (codes, cell_start, order) triple.
        dev = dict(self._dev)
        dev["cells_sorted"] = cells_sorted
        dev["codes"] = codes
        dev["cell_start"] = cell_start
        dev["order"] = order
        dev["feats"] = self._buf_feats if self._feats is not None else None
        if dev["feats"] is not None:
            # Brute exact-path metadata (tpu_query.brute_query_batch):
            # per-row ||f||^2 (pad rows are zeros -> masked by nb at query
            # time) and the occupied-cell count reported as ``visited``.
            # MUST be one jitted program: eagerly, f * f materializes a
            # store-sized square matrix (11.8 GB at 10.5M x 256 f32 — the
            # r04 searcher-rerank OOM, 22 GB of arguments); fused, XLA
            # folds convert+square into the row reduction.
            dev["feats_sq"] = _row_norms_sq(dev["feats"])
            if cell_start is not None:
                dev["n_occ"] = jnp.sum(
                    (cell_start[1:] > cell_start[:-1]).astype(jnp.int32))
            else:
                cs = cells_sorted
                sent = jnp.int32(V * V)
                dev["n_occ"] = (
                    jnp.sum(((cs[1:] != cs[:-1])
                             & (cs[1:] < sent)).astype(jnp.int32))
                    + (cs[0] < sent).astype(jnp.int32))
        else:
            dev["feats_sq"] = None
            dev["n_occ"] = None
        _pack_trace("store_meta", t, (dev.get("feats_sq"),
                                      dev.get("n_occ")))
        self._dev = dev
        self._dirty = False

    def _snapshot(self):
        """Pack if needed and return a consistent (dev, ids, cells, fine,
        nb_indexed) view for one query, immune to concurrent refreshes:
        the [:n] slices are views whose rows later appends never touch
        (appends write past n; growth swaps in fresh base arrays)."""
        with self._mutlock:
            self._pack_locked()
            n = self._n_host
            if n == 0:
                return self._dev, None, None, None, 0
            return (self._dev, self._ids[:n], self._cells[:n],
                    self._fine[:n], n)

    def get_cell(self, cell):
        """All (id, code) pairs of one cell (reference LMDB prefix-scan role,
        lopq/lopq/search.py:472-499). Host-side linear scan over the
        insertion-order arrays — API parity only, not the hot query path."""
        _, ids_arr, cells_arr, fine_arr, nb = self._snapshot()
        if nb == 0:
            return []
        c = int(cell[0]) * self.model.V + int(cell[1])
        V, S = self.model.V, self.model.subquantizer_clusters
        cdt, fdt = code_dtype_for(V), code_dtype_for(S)
        out = []
        for r in np.nonzero(cells_arr == c)[0]:
            coarse = (cdt(cells_arr[r] // V), cdt(cells_arr[r] % V))
            fine = tuple(fdt(v) for v in fine_arr[r])
            out.append((_pyid(ids_arr[r]), LOPQCode(coarse, fine)))
        return out

    # --------------------------------------------------------------- search

    #: tier-hint hysteresis: every REPROBE_EVERY-th wave restarts from the
    #: narrowest rung so the hint can shift back down when the workload
    #: eases (starting wide is never wrong — wider tiers see supersets).
    REPROBE_EVERY = 32

    def _probe_ladder(self):
        from columbiaimagesearch_tpu.index.tpu_query import probe_ladder

        return probe_ladder(self.model.V, self.probe_width)

    def _use_brute(self, d, nq, quota, nb, R):
        """Plan choice for a rerank wave: one exact brute pass over the
        resident feature store vs the grid probe ladder (see
        tpu_query.prefer_brute's cost model). Only available in rerank
        mode — the brute path's contract (true-L2 distances over ALL
        rows) is the reference's rerank contract taken to quota -> nb;
        the non-rerank contract (ADC distances over quota-limited
        candidates) keeps the ladder. An explicit probe_width pin keeps
        the grid path too (benchmarking knob)."""
        if not R or d.get("feats") is None or self.probe_width:
            return False
        from columbiaimagesearch_tpu.index.tpu_query import (prefer_brute,
                                                             rung_floor)

        ladder = self._probe_ladder()
        with self._mutlock:
            floor = rung_floor(ladder, quota, nb, self.model.V,
                               self._yield_ema)
            # Cost the rung the wave will ACTUALLY start at, not the
            # optimistic floor: when escalation evidence has pinned the
            # tier hint to a wide rung (its cert/quota genuinely needs
            # it), the floor under-costs the ladder and the plan keeps
            # paying ~110 ms top-rung waves where one exact brute pass
            # is ~15 ms/query (r05 realfeat-10M artifact: 124 waves all
            # settled at the top rung, 1 brute).
            start = max(floor, self._tier_hint)
            if start > floor and prefer_brute(ladder[start:], nq, nb,
                                              self.model.V):
                # Brute waves bypass the ladder, so the hint/yield EMA
                # would freeze and the plan could never flip back. Every
                # REPROBE_EVERY-th hint-driven brute wave runs the
                # ladder from the FLOOR instead (same cadence as the
                # escalation re-probe), letting the hint decay honestly.
                self._brute_i += 1
                if self._brute_i % self.REPROBE_EVERY == 0:
                    self._force_reprobe = True
                    return False
                return True
        return prefer_brute(ladder[start:], nq, nb, self.model.V)

    def _run_brute(self, X_dev, d, nb, R, K_emit, n_valid=None,
                   fused=False, renorm=False, count_stats=True):
        """One exact brute wave: packed launch + stats. ``X_dev``:
        [nq, Dr] index-space queries — or raw features when ``fused``
        (normalize + PCA happen in-program, the serving fast path).
        ``count_stats=False`` (prewarm) keeps warm-up launches out of
        the probe stats that benchmark artifacts report."""
        import jax.numpy as jnp

        from columbiaimagesearch_tpu.index.tpu_query import (
            brute_query_batch,
            fused_feat_brute,
            unpack_query_out,
        )

        if fused:
            packed = np.asarray(fused_feat_brute(
                jnp.asarray(X_dev), d.get("pca_P"), d.get("pca_mu"),
                d["feats"], d["feats_sq"], jnp.int32(nb), d["n_occ"],
                K_pre=R, K_out=K_emit, renorm=renorm))
        else:
            packed = np.asarray(brute_query_batch(
                jnp.asarray(X_dev), d["feats"], d["feats_sq"],
                jnp.int32(nb), d["n_occ"], K_pre=R, K_out=K_emit))
        k = n_valid if n_valid is not None else packed.shape[0]
        if count_stats:
            with self._mutlock:
                self.probe_stats["waves"] += 1
                self.probe_stats["brute_waves"] = (
                    self.probe_stats.get("brute_waves", 0) + 1)
        return unpack_query_out(packed[:k], K_emit)

    def _wave_cap(self, d, Q, V):
        """Rung-aware per-launch query cap (a function of the rung, for
        _chunk_waves). Per-query transients: ~4 KB per candidate slot
        (the one-hot ADC's [Q, F*S] bf16 contraction operand plus slot
        metadata) PLUS ~28 B per region cell on the strip rungs (the
        [NQ, G] grid/sort buffers — 40 MB/query at the 1.44M-cell top
        rung). EVERYTHING resident claims its HBM first: the rerank
        feature store (11.8 GB at 10.5M x 256 f32), but also the code
        buffers and model params — the snapshot's sorted view plus the
        insertion-order buffers run ~4.4 GB at 100M, an order past the
        fixed headroom's 10.5M assumption (the r05 100M B=64 wave OOM).
        Budget half of what remains, and floor the cap to a wave bucket:
        pad_rows rounds waves UP to the bucket set, so an off-bucket cap
        silently reinflates (cap 87 -> bucket 128 -> 17.3 GB compile
        OOM, r04)."""
        seen = set()
        resident = 0
        buffers = list(d.values()) + [self._buf_cells, self._buf_fine,
                                      self._buf_feats]
        for a in buffers:
            if (a is not None and hasattr(a, "shape")
                    and hasattr(a, "dtype") and id(a) not in seen):
                seen.add(id(a))
                resident += int(np.prod(a.shape)) * a.dtype.itemsize
        return lambda rung: LOPQSearcherTPU._wave_cap_bytes(
            resident, Q, rung, V)

    #: HBM headroom (bytes) reserved for everything that is not the wave
    #: transients: code buffers + sorted view + offsets (~0.4 GB at 10.5M),
    #: XLA scratch, and the runtime. 15.75e9 - 1.75e9 reproduces the
    #: measured-safe 14.0e9 wave budget on v5e.
    WAVE_HEADROOM_BYTES = 1.75e9

    @staticmethod
    def _wave_cap_bytes(resident_bytes, Q, rung=None, V=None):
        from columbiaimagesearch_tpu.index.tpu_query import rung_cells

        hbm = hbm_bytes_limit()
        free = max(hbm - LOPQSearcherTPU.WAVE_HEADROOM_BYTES
                   - resident_bytes, 1.2e9)
        per_q = max(Q, 1) * 4096
        if rung is not None and V:
            per_q += rung_cells(rung, V) * 28
        cap = max(8, int(free / 2 / per_q))
        return LOPQSearcherTPU._floor_wave_bucket(cap)

    @staticmethod
    def _floor_wave_bucket(cap):
        """Floor to the wave-bucket set (powers of two to 128, then
        x128): pad_rows rounds waves UP to a bucket, so an off-bucket
        cap silently reinflates (cap 87 -> bucket 128, r04 OOM)."""
        cap = max(1, int(cap))
        if cap < 128:
            return 1 << (cap.bit_length() - 1)
        return (cap // 128) * 128

    #: Process-wide wave-cap divisor, doubled by _chunk_waves each time a
    #: wave launch exhausts HBM. The _wave_cap estimate is a model, not
    #: ground truth (XLA's actual peak varies with fusion decisions and
    #: index scale — the 100M B=64 wave OOMed at an estimated-safe cap of
    #: 64); the backoff makes any cap mis-estimate a one-time retry
    #: instead of a failed query, and remembers the divisor so later
    #: waves start at the size that fit.
    _WAVE_OOM_SHRINK = 1

    @staticmethod
    def _is_device_oom(e):
        msg = str(e)
        return ("RESOURCE_EXHAUSTED" in msg or "Resource exhausted" in msg
                or "Ran out of memory" in msg
                or "Exceeded hbm capacity" in msg)

    @staticmethod
    def _chunk_waves(run_tier, nq_cap):
        """Wrap ``run_tier`` so big-quota waves split into <= nq_cap
        query chunks: per-query device transients scale with the
        candidate budget Q (and the rung's region size), so NQ x Q is
        capped to bound HBM (a 128-query wave at quota=100k allocated
        tens of GB — r04 4M adversarial sweep OOM). ``nq_cap`` may be a
        callable of the rung (rung-aware caps, see _wave_cap). A chunk
        that still exhausts HBM halves the process-wide cap
        (_WAVE_OOM_SHRINK) and retries at the smaller bucket, all the
        way down to single-query waves: with a ~11 GB resident f32
        store the true free HBM can undercut the byte model's 1.2 GB
        floor, and an 8-query wave is then already too wide (the r05
        10.5M adversarial+rerank eval died exactly there)."""
        cls = LOPQSearcherTPU

        def wrapped(idx, rung):
            cap = nq_cap(rung) if callable(nq_cap) else nq_cap
            cap = cls._floor_wave_bucket(
                max(1, cap // cls._WAVE_OOM_SHRINK))
            if len(idx) <= cap:
                try:
                    return run_tier(idx, rung)
                except Exception as e:
                    if not cls._is_device_oom(e) or cap <= 1:
                        raise
                    cls._WAVE_OOM_SHRINK *= 2
                    return wrapped(idx, rung)
            parts = [wrapped(idx[i:i + cap], rung)
                     for i in range(0, len(idx), cap)]
            return tuple(np.concatenate([p[j] for p in parts])
                         for j in range(5))
        return wrapped

    def _escalate(self, run_tier, n, quota, nb, K_pad):
        """Ladder escalation with a quota-aware rung floor plus tier-hint
        hysteresis. The floor (see tpu_query.rung_floor) derives the
        narrowest plausible starting width from the quota and the
        observed candidates-per-cell yield, so waves never pay rungs
        that provably cannot reach the quota; the hint still learns
        upward when >90% of a wave blows through the starting rung, and
        every REPROBE_EVERY-th wave restarts from the floor (not rung 0)
        so the hint can drift back down."""
        from columbiaimagesearch_tpu.index.tpu_query import (escalate_probe,
                                                             rung_floor)

        ladder = self._probe_ladder()
        # Hint/counter reads+writes stay under the lock (concurrent serving
        # waves would otherwise lose hysteresis updates or skip the
        # periodic re-probe); the device walk itself runs unlocked.
        with self._mutlock:
            floor = rung_floor(ladder, quota, nb, self.model.V,
                               self._yield_ema)
            start = min(max(self._tier_hint, floor), len(ladder) - 1)
            self._wave_i += 1
            if start > floor and (self._wave_i % self.REPROBE_EVERY == 0
                                  or self._force_reprobe):
                start = floor
            self._force_reprobe = False
        (rows, dists, ncells, frac_short, settle, yield_obs,
         settled) = escalate_probe(
            run_tier, ladder[start:], n, quota, nb, K_pad)
        with self._mutlock:
            # The hint jumps straight to the rung where >= 90% of this
            # wave's queries were satisfied (settle is relative to the
            # rung the wave started at). The old +-1-rung nudge had a
            # dead band (0.1 < frac_short < 0.9 never moved it), so a
            # workload that always escalated 64 -> 128+8 -> 256+16 re-paid
            # the narrow rungs every wave (12.8 ms/query measured vs
            # 8.5 ms for the settle rung alone, r04 searcher artifact).
            # An UNSETTLED wave (<90% satisfied even at the widest rung)
            # raises the hint only when the MAJORITY actually escalated:
            # a few outlier queries must not pin up to REPROBE_EVERY
            # subsequent in-distribution waves to the widest (110 ms)
            # rung (r04 advisor finding).
            new_hint = min(start + settle, len(ladder) - 1)
            if not settled and frac_short < 0.5:
                new_hint = self._tier_hint
            if start == floor:
                self._tier_hint = new_hint   # full ladder view: may decay
            elif settle > 0:
                # The wave ESCALATED past its start: genuine evidence the
                # hint belongs at least at the settle rung.
                self._tier_hint = max(self._tier_hint, new_hint)
            # else: satisfied AT its start rung — that is no evidence the
            # ladder NEEDS to start that wide (a narrower rung was never
            # tried). Leave the hint alone, or a re-probe wave's decay
            # can never stick under concurrency: waves launched before
            # the decay finish at the old wide rung and re-pinned it via
            # the max() — the r05 realfeat no-rerank run served 100+
            # waves at the 110 ms top rung while every re-probe settled
            # two rungs lower (510 ms p50 vs ~190 expected).
            if yield_obs is not None:
                self._yield_ema = (yield_obs if self._yield_ema is None
                                   else 0.7 * self._yield_ema
                                   + 0.3 * yield_obs)
            self.probe_stats["waves"] += 1
            self.probe_stats["escalated_queries"] += int(
                round(frac_short * n))
            # Rolling per-wave trace (start rung, frac escalated, settle
            # rung, floor, yield EMA) — the ladder's economics are only
            # diagnosable with this (e.g. a hint stuck one rung low
            # re-pays an escalation every wave); surfaces in /status and
            # the searcher bench artifact.
            self.probe_stats.setdefault("wave_log", []).append(
                [start, round(float(frac_short), 3), start + settle, floor,
                 None if self._yield_ema is None
                 else round(float(self._yield_ema), 2)])
            del self.probe_stats["wave_log"][:-64]
        return rows, dists, ncells

    def search_batch(self, X, quota=10, limit=None, with_dists=False,
                     with_codes=True, rerank_nb=None):
        return _retry_stale_snapshot(lambda: self._search_batch_impl(
            X, quota=quota, limit=limit, with_dists=with_dists,
            with_codes=with_codes, rerank_nb=rerank_nb))

    def _search_batch_impl(self, X, quota=10, limit=None, with_dists=False,
                           with_codes=True, rerank_nb=None):
        """vmap-batched queries: one device launch for len(X) queries
        (one dispatch; serving throughput mode). Returns a list of
        (results, visited) pairs.

        Serving-path host costs are trimmed: waves are padded to a small
        set of static batch sizes (one compile per bucket, not per wave
        size), and rows/dists/candidates/visited come back in ONE packed
        device-to-host transfer (each blocking sync costs ~27 ms through
        the dev relay, and round trips are never free).
        ``with_codes=True`` (the default) keeps the reference's (id, code)
        result contract; the serving path passes ``with_codes=False``
        explicitly because no serving consumer reads the codes and the
        LOPQCode tuples cost ~10 numpy scalar constructions per result.

        ``rerank_nb`` (with a resident feature store — see ``add_codes``
        feats) fuses the reference's exact rerank into the same launch:
        top-``rerank_nb`` ADC candidates re-scored against the stored
        features and re-sorted on device (reference:
        searcher_lopqhbase.py:862-912; production config serves with
        reranking on, conf/conf_search_sbpycaffe_release.json:16).
        Reranked results carry exact L2 distances and code=None."""
        import jax
        import jax.numpy as jnp

        from columbiaimagesearch_tpu.index.tpu_query import (
            lopq_query_orig,
            lopq_query_rerank,
            pack_query_out,
            rung_parts,
            unpack_query_out,
        )
        from columbiaimagesearch_tpu.utils.chunking import wave_bucket

        X = np.asarray(X, dtype=np.float32)
        if isinstance(self.model, LOPQModelPCA):
            X = self.model.apply_PCA(X)
        d, ids_arr, cells_arr, fine_arr, nb = self._snapshot()
        if nb == 0:
            return [([], 0)] * len(X)

        V = self.model.V
        if rerank_nb and d.get("feats") is None:
            raise ValueError(
                "rerank_nb requires a resident feature store "
                "(add_codes(..., feats=...) for every add)")
        K, Q, K_stage, R, K_emit = _query_geometry(quota, limit, nb,
                                                   rerank_nb)

        if self._use_brute(d, len(X), quota, nb, R):
            Xw, k = pad_rows(X, wave_bucket(len(X)))
            rows_b, dists_b, _, ncells_b, _ = self._run_brute(
                Xw, d, nb, R, K_emit, n_valid=len(X))
            K_out = min(K, K_emit)
            return [
                (self._rows_to_results(rows_b[i][:K_out],
                                       dists_b[i][:K_out], with_dists,
                                       ids_arr, cells_arr, fine_arr,
                                       with_codes=with_codes),
                 int(ncells_b[i]))
                for i in range(len(X))
            ]

        def run_tier(idx, rung):
            B, SB = rung_parts(rung)

            def qfn(q, Cs, Rs, mus, subs, codes, cell_start, order, feats,
                    cells_sorted, qq):
                if R:
                    rows, dists, total, ncells, ok = lopq_query_rerank(
                        q, feats, Cs, Rs, mus, subs, codes, cell_start,
                        order, qq, cells_sorted, V=V, B=B, Q=Q, K=K_stage,
                        R=R, K_out=K_emit, SB=SB)
                else:
                    rows, dists, total, ncells, ok = lopq_query_orig(
                        q, Cs, Rs, mus, subs, codes, cell_start,
                        order, qq, cells_sorted, V=V, B=B, Q=Q, K=K_stage,
                        SB=SB)
                return pack_query_out(rows, dists, total, ncells, ok)

            batched = jax.vmap(qfn, in_axes=(0,) + (None,) * 10)
            Xw, k = pad_rows(X[idx], wave_bucket(len(idx)))
            packed = np.asarray(batched(
                jnp.asarray(Xw), d["Cs"], d["Rs"], d["mus"], d["subs"],
                d["codes"], d.get("cell_start"), d["order"],
                d.get("feats"),
                d["cells_sorted"] if d.get("cell_start") is None else None,
                jnp.asarray(quota, dtype=jnp.int32)))    # one D2H sync
            return unpack_query_out(packed[:k], K_emit)

        rows_b, dists_b, ncells_b = self._escalate(
            self._chunk_waves(run_tier, self._wave_cap(d, Q, V)),
            len(X), quota, nb, K_emit)
        K_out = min(K, K_emit)
        return [
            (self._rows_to_results(rows_b[i][:K_out], dists_b[i][:K_out],
                                   with_dists, ids_arr, cells_arr, fine_arr,
                                   with_codes=with_codes),
             int(ncells_b[i]))
            for i in range(len(X))
        ]

    def _rows_to_results(self, rows, dists, with_dists, ids_arr, cells_arr,
                         fine_arr, with_codes=True):
        V_, S = self.model.V, self.model.subquantizer_clusters
        cdt, fdt = code_dtype_for(V_), code_dtype_for(S)
        ids = (ids_arr if ids_arr is not None
               else np.arange(len(cells_arr)))
        if not with_codes:
            # Serving hot path: one vectorized mask + fancy index instead
            # of per-row numpy scalar checks (~0.3 ms/query at K=100 on
            # one host core).
            rows = np.asarray(rows)
            dists = np.asarray(dists)
            mask = (rows >= 0) & np.isfinite(dists)
            sel_ids = ids[rows[mask]]
            if with_dists:
                return [ResultDist(_pyid(i), None, d)
                        for i, d in zip(sel_ids, dists[mask].tolist())]
            return [Result(_pyid(i), None) for i in sel_ids]
        out = []
        for r, dist in zip(rows, dists):
            if r < 0 or not np.isfinite(dist):
                continue
            coarse = (cdt(cells_arr[r] // V_), cdt(cells_arr[r] % V_))
            fine = tuple(fdt(v) for v in fine_arr[r])
            code = LOPQCode(coarse, fine)
            if with_dists:
                out.append(ResultDist(_pyid(ids[r]), code, float(dist)))
            else:
                out.append(Result(_pyid(ids[r]), code))
        return out

    def search_device_feats(self, feats_dev, quota=10, limit=None,
                            with_dists=True, rerank_nb=None, n_valid=None):
        return _retry_stale_snapshot(lambda: self._search_device_feats_impl(
            feats_dev, quota=quota, limit=limit, with_dists=with_dists,
            rerank_nb=rerank_nb, n_valid=n_valid))

    def _search_device_feats_impl(self, feats_dev, quota=10, limit=None,
                                  with_dists=True, rerank_nb=None,
                                  n_valid=None):
        """Serving fast path: RAW device-resident features (straight from
        the featurizer forward, pre-normalize, pre-PCA) -> results, in one
        program + one device-to-host sync per probe tier (waves padded to
        static bucket sizes). With ``rerank_nb`` and a resident feature
        store the exact rerank is fused in too (see :meth:`search_batch`).
        Results carry code=None (like the sharded/exhaustive backends).
        Returns [(results, visited)] per query, same structure as
        :meth:`search_batch`.

        ``n_valid``: the wave may arrive already bucket-padded straight
        from ``featurize_wave`` (rows past ``n_valid`` are padding) — the
        first tier then runs the array as-is with ZERO reshaping
        dispatches, answers come back for the first ``n_valid`` queries
        only, and pad rows never enter the escalation bookkeeping (a
        zero-feature pad row always falls short of the quota and would
        otherwise drag every wave onto the wider rungs)."""
        import jax.numpy as jnp

        from columbiaimagesearch_tpu.index.tpu_query import (
            fused_feat_query,
            rung_parts,
            unpack_query_out,
        )
        from columbiaimagesearch_tpu.utils.chunking import wave_bucket

        if feats_dev.ndim == 1:
            feats_dev = feats_dev[None, :]
        d, ids_arr, cells_arr, fine_arr, nb = self._snapshot()
        nq = int(n_valid) if n_valid is not None else int(feats_dev.shape[0])
        if nb == 0:
            return [([], 0)] * nq

        V = self.model.V
        renorm = bool(getattr(self.model, "renorm", False))
        if rerank_nb and d.get("feats") is None:
            raise ValueError(
                "rerank_nb requires a resident feature store "
                "(add_codes(..., feats=...) for every add)")
        K, Q, K_stage, R, K_emit = _query_geometry(quota, limit, nb,
                                                   rerank_nb)

        if self._use_brute(d, nq, quota, nb, R):
            Xw, _ = pad_rows(feats_dev, wave_bucket(nq))
            rows_b, dists_b, _, ncells_b, _ = self._run_brute(
                Xw, d, nb, R, K_emit, n_valid=nq, fused=True,
                renorm=renorm)
            K_out = min(K, K_emit)
            return [
                (self._rows_to_results(rows_b[i][:K_out],
                                       dists_b[i][:K_out], with_dists,
                                       ids_arr, cells_arr, fine_arr,
                                       with_codes=False),
                 int(ncells_b[i]))
                for i in range(nq)
            ]

        def run_tier(idx, rung):
            B, SB = rung_parts(rung)
            if len(idx) == nq:
                # Full wave: pad_rows is a no-op when the caller handed a
                # pre-padded wave (n_valid path) — no device reshaping.
                Xw, _ = pad_rows(feats_dev, wave_bucket(nq))
                k = nq
            else:
                Xt = jnp.take(feats_dev, jnp.asarray(idx), axis=0)
                Xw, k = pad_rows(Xt, wave_bucket(len(idx)))
            packed = np.asarray(fused_feat_query(
                Xw, d.get("pca_P"), d.get("pca_mu"),
                d["Cs"], d["Rs"], d["mus"], d["subs"],
                d["codes"], d.get("cell_start"), d["order"],
                jnp.asarray(quota, dtype=jnp.int32), d.get("feats"),
                d["cells_sorted"] if d.get("cell_start") is None else None,
                V=V, B=B, Q=Q, K=K_stage, R=R, K_out=K_emit, renorm=renorm,
                SB=SB,
                lut_impl="stream"))  # one D2H sync; stream is vmap-safe
            return unpack_query_out(packed[:k], K_emit)

        rows_b, dists_b, ncells_b = self._escalate(
            self._chunk_waves(run_tier, self._wave_cap(d, Q, V)),
            nq, quota, nb, K_emit)
        K_out = min(K, K_emit)
        return [
            (self._rows_to_results(rows_b[i][:K_out], dists_b[i][:K_out],
                                   with_dists, ids_arr, cells_arr, fine_arr,
                                   with_codes=False),
             int(ncells_b[i]))
            for i in range(nq)
        ]

    def prewarm_ladder(self, quota=10, limit=None, rerank_nb=None,
                       waves=(1,)):
        """Force-compile EVERY ladder rung program of the fused serving
        path (plus the brute plan when the store is resident) for the
        given query geometry, at each wave bucket in ``waves``.

        ``GenericSearcher.prewarm_serving``'s synthetic request only
        compiles the rungs its OWN escalation path visits: the rung
        floor provably skips hopeless narrow rungs for that query, and
        the settle hint starts later waves wherever IT settled — so a
        live query that settles on a skipped rung paid a mid-request
        relay compile (~10 s from a warm compile cache, 30-300 s cold:
        the 10.5 s serving p99 outliers, r5). Zero-vector queries drive
        each rung directly; results are discarded and neither the yield
        EMA nor the tier hint is touched.

        :returns: number of rung programs driven."""
        import jax.numpy as jnp

        from columbiaimagesearch_tpu.index.tpu_query import (
            fused_feat_query,
            rung_parts,
            unpack_query_out,
        )
        from columbiaimagesearch_tpu.utils.chunking import (
            pad_rows,
            wave_bucket,
        )

        d, _ids, _cells, _fine, nb = self._snapshot()
        if nb == 0:
            return 0
        V = self.model.V
        renorm = bool(getattr(self.model, "renorm", False))
        if rerank_nb and d.get("feats") is None:
            rerank_nb = None
        _K, Q, K_stage, R, K_emit = _query_geometry(quota, limit, nb,
                                                    rerank_nb)
        feat_dim = (d["pca_P"].shape[0] if d.get("pca_P") is not None
                    else d["Cs"].shape[0] * d["Cs"].shape[2])
        n_progs = 0
        for w in sorted({wave_bucket(max(1, int(b))) for b in waves}):
            X = jnp.zeros((w, feat_dim), jnp.float32)

            def run_tier(idx, rung):
                # Same launch as _search_device_feats_impl.run_tier (the
                # jit key must match live traffic exactly).
                B, SB = rung_parts(rung)
                Xt = X if len(idx) == w else jnp.take(
                    X, jnp.asarray(idx), axis=0)
                Xw, k = pad_rows(Xt, wave_bucket(len(idx)))
                packed = np.asarray(fused_feat_query(
                    Xw, d.get("pca_P"), d.get("pca_mu"),
                    d["Cs"], d["Rs"], d["mus"], d["subs"],
                    d["codes"], d.get("cell_start"), d["order"],
                    jnp.asarray(quota, dtype=jnp.int32), d.get("feats"),
                    d["cells_sorted"] if d.get("cell_start") is None
                    else None,
                    V=V, B=B, Q=Q, K=K_stage, R=R, K_out=K_emit,
                    renorm=renorm, SB=SB, lut_impl="stream"))
                return unpack_query_out(packed[:k], K_emit)

            # Through _chunk_waves: the rung-aware cap and the OOM
            # backoff apply exactly as they would under live traffic, so
            # the buckets compiled here are the buckets live waves use.
            wrapped = self._chunk_waves(run_tier,
                                        self._wave_cap(d, Q, V))
            for rung in self._probe_ladder():
                wrapped(np.arange(w), rung)
                n_progs += 1
            if R:
                Xp, _ = pad_rows(X, w)
                self._run_brute(Xp, d, nb, R, K_emit, n_valid=w,
                                fused=True, renorm=renorm,
                                count_stats=False)
                n_progs += 1
        return n_progs

    def search(self, x, quota=10, limit=None, with_dists=False,
               rerank_nb=None):
        return _retry_stale_snapshot(lambda: self._search_impl(
            x, quota=quota, limit=limit, with_dists=with_dists,
            rerank_nb=rerank_nb))

    def _search_impl(self, x, quota=10, limit=None, with_dists=False,
                     rerank_nb=None):
        """Fused device query; same contract as the parity searcher.
        Escalates the probe width when the candidate total falls short of
        the quota or the grid certificate fails (see :attr:`PROBE_LADDER`);
        ``rerank_nb`` fuses the exact rerank (see :meth:`search_batch`)."""
        import jax.numpy as jnp

        from columbiaimagesearch_tpu.index.tpu_query import (
            lopq_query_orig,
            lopq_query_rerank,
            pack_query_out,
            rung_parts,
            unpack_query_out,
        )

        if isinstance(self.model, LOPQModelPCA):
            x = self.model.apply_PCA(x)
        d, ids_arr, cells_arr, fine_arr, nb = self._snapshot()
        if nb == 0:
            return [], 0

        V = self.model.V
        if rerank_nb and d.get("feats") is None:
            raise ValueError(
                "rerank_nb requires a resident feature store "
                "(add_codes(..., feats=...) for every add)")
        K, Q, K_stage, R, K_emit = _query_geometry(quota, limit, nb,
                                                   rerank_nb)
        xd = jnp.asarray(np.asarray(x, dtype=np.float32))

        if self._use_brute(d, 1, quota, nb, R):
            rows_b, dists_b, _, ncells_b, _ = self._run_brute(
                xd[None, :], d, nb, R, K_emit)
            K_out = min(K, K_emit)
            return (self._rows_to_results(rows_b[0][:K_out],
                                          dists_b[0][:K_out], with_dists,
                                          ids_arr, cells_arr, fine_arr),
                    int(ncells_b[0]))

        cs = d["cells_sorted"] if d.get("cell_start") is None else None

        def run_tier(idx, rung):
            # n=1 wave; the shared _escalate driver owns the ladder walk
            # and the tier-hint hysteresis (one policy, three callers).
            B, SB = rung_parts(rung)
            impl = "auto" if SB == 0 else "stream"  # pallas LUTs are
            #   probed-slot-indexed; strip rungs use rank slots into the
            #   full order and take the streaming residual path
            if R:
                out_d = lopq_query_rerank(
                    xd, d["feats"], d["Cs"], d["Rs"], d["mus"], d["subs"],
                    d["codes"], d.get("cell_start"), d["order"], quota, cs,
                    V=V, B=B, Q=Q, K=K_stage, R=R, K_out=K_emit, SB=SB,
                    lut_impl=impl)
            else:
                out_d = lopq_query_orig(
                    xd, d["Cs"], d["Rs"], d["mus"], d["subs"],
                    d["codes"], d.get("cell_start"), d["order"], quota, cs,
                    V=V, B=B, Q=Q, K=K_stage, SB=SB, lut_impl=impl)
            packed = np.asarray(
                pack_query_out(*out_d))             # one D2H sync per tier
            rows, dists, total, n_cells, ok = unpack_query_out(
                packed, K_emit)
            return (rows[None], dists[None], np.asarray([total]),
                    np.asarray([n_cells]), np.asarray([ok]))

        rows_b, dists_b, ncells_b = self._escalate(
            run_tier, 1, quota, nb, K_emit)
        K_out = min(K, K_emit)
        return (self._rows_to_results(rows_b[0][:K_out], dists_b[0][:K_out],
                                      with_dists, ids_arr, cells_arr,
                                      fine_arr),
                int(ncells_b[0]))
