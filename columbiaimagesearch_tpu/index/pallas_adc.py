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
~8 KB/block) and the kernel consumes CHUNK=8 aligned blocks per grid step.
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
CHUNK = 8    # cell-blocks processed per grid step


def _adc_kernel(block_count, codes_ref, lut_ref, out_ref):
    """Score CHUNK cell-blocks: out[j, b] = sum_m lut[j, m, codes[j*BLK+b, m]]."""
    i = pl.program_id(0)
    M = codes_ref.shape[1]
    S = lut_ref.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)[:, 0]
    for j in range(CHUNK):
        codes = codes_ref[j * BLK:(j + 1) * BLK, :].astype(jnp.int32)
        # One-hot via iota comparison -> [BLK, M, S]; contract on the MXU.
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, M, S), 2)
        onehot = (iota == codes[:, :, None]).astype(jnp.float32)
        dists = jax.lax.dot_general(
            onehot.reshape(BLK, M * S), lut_ref[j].reshape(M * S),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [BLK]
        valid = row < block_count[i * CHUNK + j]
        out_ref[j, :] = jnp.where(valid, dists, jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def adc_scan_all(codes_padded, block_count, lut_blocks, *,
                 n_blocks: int, interpret: bool = False):
    """Exhaustive ADC distances for every (padded) row.

    :param codes_padded: [n_blocks*BLK, M] uint8, cell-major, per-cell padded
    :param block_count: [n_blocks] int32 valid rows per block
    :param lut_blocks: [n_blocks, M, S] float32 -- this query's table rows
        for each block's cell (pre-gathered; see :func:`gather_block_luts`)
    :returns: [n_blocks*BLK] float32 distances (+inf on padding)
    """
    M = codes_padded.shape[1]
    S = lut_blocks.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK * BLK, M), lambda i, bn: (i, 0)),
            pl.BlockSpec((CHUNK, M, S), lambda i, bn: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, BLK), lambda i, bn: (i, 0)),
    )
    out = pl.pallas_call(
        _adc_kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks, BLK), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_count, codes_padded, lut_blocks)
    return out.reshape(n_blocks * BLK)


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
def build_query_luts(x, Cs, Rs, mus, subs):
    """Per-split ADC tables for ALL V clusters: ([V, F, S], [V, F, S])."""
    V, Dh = Cs.shape[1], Cs.shape[2]
    F, S, Dsub = subs.shape[1], subs.shape[2], subs.shape[3]
    x2 = x.reshape(2, Dh)
    luts = []
    for s in range(2):
        r = x2[s][None, :] - Cs[s] - mus[s]               # [V, Dh]
        pr = jnp.einsum("vij,vj->vi", Rs[s], r,
                        precision="highest")              # [V, Dh]
        prf = pr.reshape(V, F, Dsub)
        diff = prf[:, :, None, :] - subs[s][None, :, :, :]
        luts.append(jnp.sum(diff * diff, axis=-1))        # [V, F, S]
    return luts[0], luts[1]


@functools.partial(jax.jit, static_argnames=("V",))
def gather_block_luts(lut0, lut1, block_cell, V: int):
    """Per-block concatenated table rows: [NB, M, S]."""
    c0 = block_cell // V
    c1 = block_cell % V
    return jnp.concatenate([lut0[c0], lut1[c1]], axis=1)  # [NB, M, S]


class ExhaustiveADC:
    """Exact-search facade over the kernel.

    >>> ex = ExhaustiveADC(model)
    >>> ex.build(coarse, fine, ids)
    >>> ids, dists = ex.search(q, k=10)
    """

    def __init__(self, model, interpret=False):
        self.model = model
        self.interpret = interpret
        self._dev = None
        self._ids = None

    def build(self, coarse, fine, ids=None):
        coarse = np.asarray(coarse)
        cells = (coarse[:, 0].astype(np.int64) * self.model.V
                 + coarse[:, 1].astype(np.int64))
        codes_padded, block_cell, block_count, row_of = \
            build_padded_layout(cells, fine)
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
        from columbiaimagesearch_tpu.index.model import LOPQModelPCA

        if isinstance(self.model, LOPQModelPCA):
            x = self.model.apply_PCA(x)
        d = self._dev
        lut0, lut1 = build_query_luts(
            jnp.asarray(np.asarray(x, dtype=np.float32)),
            d["Cs"], d["Rs"], d["mus"], d["subs"])
        lut_blocks = gather_block_luts(lut0, lut1, d["block_cell"],
                                       self.model.V)
        dists = adc_scan_all(
            d["codes"], d["block_count"], lut_blocks,
            n_blocks=self.n_blocks, interpret=self.interpret)
        neg, idx = jax.lax.top_k(-dists, min(k, dists.shape[0]))
        idx = np.asarray(idx)
        out_d = -np.asarray(neg)
        keep = np.isfinite(out_d)
        return [self._ids[i] for i in idx[keep]], out_d[keep]
