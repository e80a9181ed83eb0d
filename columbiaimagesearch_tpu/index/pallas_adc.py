"""Pallas exhaustive-ADC kernel: exact LOPQ search with no cell probing.

The reference can only rank candidates from probed cells (quota semantics,
reference: lopq/lopq/search.py:110-177); recall is bounded by the probe. On
TPU, for moderate coarse codebooks the per-cluster ADC tables are small
enough that a kernel can stream every PQ code in the index from HBM and
score it -- exact asymmetric-distance search over the full index, a
capability the reference does not have.

Index layout: codes sorted by cell id with every cell's run padded to
BLK=128 rows, so each 128-row block belongs to exactly one cell. Per query,
the block's [M, S] table rows are gathered once per block ([NB, M, S],
~8 KB/block) and the kernel consumes CHUNK aligned blocks per grid step.
Scoring uses the iota-comparison one-hot trick: the per-row table lookup
becomes a [BLK, M*S] x [M*S] contraction on the MXU; no in-kernel gathers
anywhere.

Use when N / V^2 >= ~BLK (cells are block-sized on average) -- e.g. face
indexes (V=64..256 over millions of faces) -- or whenever exact recall is
worth the padded memory.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128    # rows per cell-block; also the per-cell padding quantum
CHUNK = 2    # cell-blocks per grid step (unrolled; bounded by VMEM stack)


def _adc_kernel(block_cell, block_count, codes_ref, *rest):
    """Score CHUNK cell-blocks for NQ queries each.

    The M per-subquantizer lookups are ONE MXU contraction per block: the
    M one-hots ([BLK, S] iota compares) concatenate along lanes into
    [BLK, M*S], the block's two LUT halves concatenate along sublanes into
    [M*S, NQ], and a single [M*S]-long contraction yields [NQ, BLK] —
    folding what used to be M short-[S] matmuls (23% faster end-to-end at
    the V=64/1M/NQ=8 config even with dispatch overhead included; the
    in-kernel matmul count drops M-fold). Each block's LUT arrives as its
    own prefetched
    operand; CHUNK blocks share a grid step (CHUNK=2 keeps the unrolled
    one-hot temporaries within the Mosaic VMEM stack budget at V=256).

    Perf note (measured on v5e): the scan cost is nearly flat in NQ (the
    [M*S, NQ] x [BLK, M*S] contraction uses NQ/128 output sublanes);
    larger NQ amortizes but linearly grows the per-block LUT DMA — NQ=8
    balances the two on this generation for serving, NQ=64 for bulk eval.
    """
    del block_cell
    luts = rest[:2 * CHUNK]
    out_ref = rest[2 * CHUNK]
    i = pl.program_id(0)
    M = codes_ref.shape[1]
    F = M // 2
    S = luts[0].shape[2]
    NQ = luts[0].shape[3]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (BLK, S), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (NQ, BLK), 1)
    for j in range(CHUNK):
        oh = []
        for m in range(M):
            cm = codes_ref[j * BLK:(j + 1) * BLK, m].astype(jnp.int32)
            oh.append((iota2 == cm[:, None]).astype(jnp.float32))
        oh_all = jnp.concatenate(oh, axis=1)              # [BLK, M*S]
        lut_all = jnp.concatenate(
            [luts[j][0, f] for f in range(F)]
            + [luts[CHUNK + j][0, f] for f in range(F)], axis=0)  # [M*S, NQ]
        acc = jax.lax.dot_general(
            lut_all, oh_all,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [NQ, BLK]
        valid = qrow < block_count[i * CHUNK + j]
        out_ref[j, :, :] = jnp.where(valid, acc, jnp.inf)


@functools.partial(jax.jit, static_argnames=("V", "n_blocks", "interpret"))
def adc_scan_all(codes_padded, block_cell, block_count, lut0, lut1, *,
                 V: int, n_blocks: int, interpret: bool = False):
    """Exhaustive ADC distances for NQ queries over every (padded) row.

    :param codes_padded: [n_blocks*BLK, M] uint8, cell-major, per-cell padded
    :param block_cell: [n_blocks] int32 cell id per block
    :param block_count: [n_blocks] int32 valid rows per block
    :param lut0/lut1: [V, F, S, NQ] float32 per-split tables for NQ queries
    :returns: [NQ, n_blocks*BLK] float32 distances (+inf on padding)
    """
    M = codes_padded.shape[1]
    F = M // 2
    S = lut0.shape[2]
    NQ = lut0.shape[3]

    def lut0_spec(j):
        return pl.BlockSpec(
            (1, F, S, NQ),
            functools.partial(
                lambda jj, i, bc, bn: (bc[i * CHUNK + jj] // V, 0, 0, 0), j))

    def lut1_spec(j):
        return pl.BlockSpec(
            (1, F, S, NQ),
            functools.partial(
                lambda jj, i, bc, bn: (bc[i * CHUNK + jj] % V, 0, 0, 0), j))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks // CHUNK,),
        in_specs=(
            [pl.BlockSpec((CHUNK * BLK, M), lambda i, bc, bn: (i, 0))]
            + [lut0_spec(j) for j in range(CHUNK)]
            + [lut1_spec(j) for j in range(CHUNK)]
        ),
        out_specs=pl.BlockSpec((CHUNK, NQ, BLK), lambda i, bc, bn: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _adc_kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks, NQ, BLK), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_cell, block_count, codes_padded,
      *([lut0] * CHUNK), *([lut1] * CHUNK))
    return jnp.swapaxes(out, 0, 1).reshape(NQ, n_blocks * BLK)


def build_padded_layout(cells, fine):
    """Host-side packing: cell-major order with per-cell BLK padding.

    :param cells: [N] int cell ids
    :param fine: [N, M] uint8 fine codes
    :returns: (codes_padded [NB*BLK, M], block_cell [NB], block_count [NB],
        row_of [N] int -- padded position of each input row)
    """
    cells = np.asarray(cells)
    fine = np.asarray(fine, dtype=np.uint8)
    order = np.argsort(cells, kind="stable")
    uniq, counts = np.unique(cells, return_counts=True)
    padded = ((counts + BLK - 1) // BLK) * BLK
    pstart = np.zeros(len(uniq) + 1, dtype=np.int64)
    np.cumsum(padded, out=pstart[1:])
    NB = int(pstart[-1]) // BLK
    NB = ((NB + CHUNK - 1) // CHUNK) * CHUNK  # grid multiple

    codes_padded = np.zeros((NB * BLK, fine.shape[1]), dtype=np.uint8)
    block_cell = np.zeros(NB, dtype=np.int32)
    block_count = np.zeros(NB, dtype=np.int32)
    row_of = np.zeros(len(cells), dtype=np.int64)

    cstart = np.zeros(len(uniq) + 1, dtype=np.int64)
    np.cumsum(counts, out=cstart[1:])
    for u in range(len(uniq)):
        rows = order[cstart[u]:cstart[u + 1]]
        base = pstart[u]
        codes_padded[base:base + len(rows)] = fine[rows]
        row_of[rows] = base + np.arange(len(rows))
        b0 = base // BLK
        nb = padded[u] // BLK
        block_cell[b0:b0 + nb] = uniq[u]
        full, rem = divmod(int(counts[u]), BLK)
        block_count[b0:b0 + full] = BLK
        if rem:
            block_count[b0 + full] = rem
    return codes_padded, block_cell, block_count, row_of


@functools.partial(jax.jit, static_argnames=())
def build_query_luts(X, Cs, Rs, mus, subs):
    """Per-split ADC tables for ALL V clusters for a batch of NQ queries:
    ([V, F, S, NQ], [V, F, S, NQ])."""
    V, Dh = Cs.shape[1], Cs.shape[2]
    F, S, Dsub = subs.shape[1], subs.shape[2], subs.shape[3]
    NQ = X.shape[0]
    x2 = X.reshape(NQ, 2, Dh)
    luts = []
    for s in range(2):
        r = x2[:, s, None, :] - (Cs[s] + mus[s])[None]        # [NQ, V, Dh]
        pr = jnp.einsum("vij,qvj->qvi", Rs[s], r,
                        precision="highest")                  # [NQ, V, Dh]
        prf = pr.reshape(NQ, V, F, Dsub)
        diff = prf[:, :, :, None, :] - subs[s][None, None]    # [NQ,V,F,S,Dsub]
        lut = jnp.sum(diff * diff, axis=-1)                   # [NQ, V, F, S]
        luts.append(jnp.transpose(lut, (1, 2, 3, 0)))         # [V, F, S, NQ]
    return luts[0], luts[1]


class ExhaustiveADC:
    """Exact-search facade over the kernel.

    >>> ex = ExhaustiveADC(model)
    >>> ex.build(coarse, fine, ids)
    >>> ids, dists = ex.search(q, k=10)
    """

    def __init__(self, model, interpret=None, nq=8):
        """:param interpret: force Pallas interpreter mode; default (None)
        compiles on TPU backends and interprets elsewhere (the compiled
        kernel is TPU-only)."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.model = model
        self.interpret = interpret
        self.NQ = int(nq)
        self._dev = None
        self._ids = None

    def build(self, coarse, fine, ids=None):
        coarse = np.asarray(coarse)
        cells = (coarse[:, 0].astype(np.int64) * self.model.V
                 + coarse[:, 1].astype(np.int64))
        codes_padded, block_cell, block_count, row_of = \
            build_padded_layout(cells, fine)
        ratio = len(codes_padded) / max(len(cells), 1)
        if ratio > 8 and len(codes_padded) > (1 << 22):
            # Only a real-memory problem at scale; tiny test indexes pad
            # heavily by construction and are fine.
            raise ValueError(
                f"exhaustive layout would pad {len(cells)} rows to "
                f"{len(codes_padded)} ({ratio:.0f}x): cells average far "
                f"fewer than BLK={BLK} rows at V={self.model.V}. Use the "
                "probed searcher, or a smaller coarse codebook (the kernel "
                "is intended for N/V^2 >= ~128, e.g. face indexes)")
        n = len(cells)
        ids_arr = np.empty(n, dtype=object)
        ids_arr[:] = (list(ids) if ids is not None else range(n))
        by_row = np.empty(len(codes_padded), dtype=object)
        by_row[row_of] = ids_arr
        self._ids = by_row
        self._dev = {
            "codes": jnp.asarray(codes_padded),
            "block_cell": jnp.asarray(block_cell),
            "block_count": jnp.asarray(block_count),
            "Cs": jnp.stack([jnp.asarray(C) for C in self.model.Cs]),
            "Rs": jnp.stack([jnp.asarray(R) for R in self.model.Rs]),
            "mus": jnp.stack([jnp.asarray(m) for m in self.model.mus]),
            "subs": jnp.stack([jnp.stack([jnp.asarray(s) for s in h])
                               for h in self.model.subquantizers]),
        }
        self.n_blocks = len(block_cell)

    def search(self, x, k=10):
        """Single query convenience -> (ids, dists)."""
        out = self.search_batch(np.asarray(x, dtype=np.float32)[None], k=k)
        return out[0]

    def search_batch(self, X, k=10):
        """Exact top-k for a batch of queries; one kernel launch per NQ.

        :returns: list of (ids, dists) per query
        """
        from columbiaimagesearch_tpu.index.model import LOPQModelPCA

        X = np.asarray(X, dtype=np.float32)
        if isinstance(self.model, LOPQModelPCA):
            X = self.model.apply_PCA(X)
        d = self._dev
        results = []
        for b in range(0, len(X), self.NQ):
            chunk = X[b:b + self.NQ]
            n_real = len(chunk)
            if n_real < self.NQ:
                chunk = np.pad(chunk, [(0, self.NQ - n_real), (0, 0)])
            lut0, lut1 = build_query_luts(
                jnp.asarray(chunk), d["Cs"], d["Rs"], d["mus"], d["subs"])
            dists = adc_scan_all(
                d["codes"], d["block_cell"], d["block_count"], lut0, lut1,
                V=self.model.V, n_blocks=self.n_blocks,
                interpret=self.interpret)
            kk = min(k, dists.shape[1])
            neg, idx = jax.lax.top_k(-dists, kk)
            idx = np.asarray(idx)
            out_d = -np.asarray(neg)
            for q in range(n_real):
                keep = np.isfinite(out_d[q])
                results.append(([self._ids[i] for i in idx[q][keep]],
                                out_d[q][keep]))
        return results


class ExhaustiveADCSearcher:
    """LOPQSearcher-compatible facade over :class:`ExhaustiveADC`.

    Drop-in backend for SearcherLOPQ(exact=True): accumulates code dicts,
    rebuilds the padded layout lazily, returns Result tuples. ``quota`` is
    ignored — every indexed item is scored.
    """

    def __init__(self, model, interpret=None):
        import threading

        self.model = model
        self.index = ExhaustiveADC(model, interpret=interpret)
        self._coarse, self._fine, self._ids2 = [], [], []
        self._dirty = False
        self._mutlock = threading.RLock()
        self.nb_indexed = 0

    def add_codes_from_dict(self, codes_dict):
        with self._mutlock:
            for sid, (coarse, fine) in codes_dict.items():
                self._coarse.append(coarse)
                self._fine.append(fine)
                self._ids2.append(sid)
            self._dirty = True

    def get_nb_indexed(self):
        self._maybe_build()
        return self.nb_indexed

    def _maybe_build(self):
        with self._mutlock:
            self._maybe_build_locked()

    def _maybe_build_locked(self):
        if self._dirty and self._ids2:
            seen = set()
            coarse, fine, ids = [], [], []
            for c, f, i in zip(self._coarse, self._fine, self._ids2):
                key = (tuple(int(x) for x in c), i)
                if key in seen:
                    continue
                seen.add(key)
                coarse.append(c)
                fine.append(f)
                ids.append(i)
            self.index.build(np.asarray(coarse, dtype=np.int32),
                             np.asarray(fine, dtype=np.uint8), ids)
            self.nb_indexed = len(ids)
            self._dirty = False

    def search(self, x, quota=10, limit=None, with_dists=False):
        from columbiaimagesearch_tpu.index.searcher import Result, ResultDist

        self._maybe_build()
        if self.nb_indexed == 0:
            return [], 0
        k = limit if limit is not None else quota
        ids, dists = self.index.search(np.asarray(x, dtype=np.float32), k=k)
        if with_dists:
            out = [ResultDist(rid, None, float(d))
                   for rid, d in zip(ids, dists)]
        else:
            out = [Result(rid, None) for rid in ids]
        # visited = all cells, by construction
        return out, self.model.V * self.model.V
