"""Fused on-device LOPQ query: probe + gather + ADC + top-k in one jit.

This replaces the reference's host-side hot loops — heap-driven cell probing
(reference: lopq/lopq/search.py:110-135 ``get_result_quota``) and per-item
ADC distance sums with per-cluster LUT memoization
(reference: lopq/lopq/search.py:137-177 ``compute_distances``,
lopq/lopq/model.py:673-704 ``get_subquantizer_distances``) — with a single
static-shape XLA program:

1. coarse distances per split (two small matmuls),
2. top-B clusters per split; the B x B cell grid sorted by approximate
   distance is the multisequence visitation order. Escalation rungs with
   SB > 0 augment the square with SB-deep edge strips (bounded to
   min(8B, V) ranks) — the walk region's thin arms along the rank axes
   are what made square certificates fail at production quotas — sorted
   the same way via one multi-payload lax.sort over the flat region
   (separate [G] payload arrays: a packed [G, k] meta table would pad
   its minor dim to 128 under vmap). Square rungs wider than the sort
   cutoff (B*B > 16384, reachable only via an explicit probe_width pin
   now that the ladder escalates through strip rungs) keep the
   sort-free path: the quota-crossing threshold via per-row binary
   searches against a row-cumsum table, candidate distances straight
   from rotated residuals instead of LUT + one-hot (stages 4-5 below),
3. ragged cell buckets resolved to a fixed candidate budget Q via cumsum +
   a scatter-add bucket map over the CSR ``cell_start`` table,
4. ADC lookup tables for the 2B probed clusters,
5. distance per candidate via one-hot MXU contractions, masked top-K.

The index layout is CSR: codes sorted by cell id with a [V^2 + 1] offsets
table, so a cell's bucket is one contiguous slice (the role the LMDB
prefix-scan plays in the reference, lopq/lopq/search.py:472-499).

TPU shape notes (stage-profiled on v5e at the 10M/V=4096 headline config,
scripts/profile_query.py / profile_lut.py, round 2):

- The rotation matrices are applied with one streaming batched matvec over
  ALL V clusters and the B probed rows gathered *afterwards* ([V, Dh] rows
  are cheap to gather; [V, Dh, Dh] rows are not: XLA's gather of 64
  rotation matrices measured 1.69 ms vs 0.76 ms for the full-V stream —
  HBM-bandwidth-bound vs gather-latency-bound). Under vmap the stream is
  shared by the whole query batch.
- Per-candidate LUT lookups are one-hot [Q, F*S] x [F*S, B] MXU
  contractions instead of gathers (0.15 ms vs 0.73 ms measured): gathers
  are the TPU's weakness, matmuls its strength. The one-hot operand is
  bfloat16 (0/1 exact); the table side stays float32 and the contraction
  runs at HIGHEST precision, so products are exact and only the f32
  accumulation order differs from the gather formulation.
- The per-candidate bucket metadata (cell start / cumulative counts /
  probe-slot ids) is packed into one [B*B, 8] table so slot resolution is
  a single row gather instead of five scalar gathers.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_compiled_ok():
    """True when Pallas kernels can run compiled on the default backend
    (TPU); elsewhere kernels fall back to interpret mode / the streaming
    XLA path."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def _lut_kernel(isel_ref, x2_ref, c_ref, mu_ref, rf_ref, subs_ref,
                subsq_ref, out_ref):
    """One grid step = one probed cluster of one split: DMA its [Dh, Dh]
    rotation row (via the scalar-prefetched index map), rotate the residual
    on the MXU, and emit the [F, S] subquantizer distance table.

    Every op stays 2D (Mosaic rejects cross-lane reshapes): the rotation
    row arrives pre-split per fine split as [F, Dsub, Dh], and the table
    uses the expansion ||pr - sub||^2 = ||pr||^2 - 2 pr.sub + ||sub||^2,
    making the inner products MXU contractions. Cs/mus arrive as
    [2, V, 1, Dh] (the gathered V axis must stay out of the last two dims
    for Mosaic's block-shape rules)."""
    s = pl.program_id(0)
    r = x2_ref[pl.ds(s, 1), :] - c_ref[0, 0] - mu_ref[0, 0]     # [1, Dh]
    F = subs_ref.shape[1]
    for f in range(F):  # static unroll (F=M/2, small)
        # pr_f[d] = sum_j R[f*Dsub + d, j] * r[j]
        prf = jax.lax.dot_general(
            r, rf_ref[0, 0, f],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                 # [1, Dsub]
        cross = jax.lax.dot_general(
            prf, subs_ref[0, f],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                 # [1, S]
        psum = jnp.sum(prf * prf)
        out_ref[0, 0, pl.ds(f, 1), :] = (
            psum - 2.0 * cross + subsq_ref[0, pl.ds(f, 1), :])


def build_luts_pallas(x2, isel, Cs, Rs, mus, subs, *, interpret):
    """ADC tables for the probed clusters via per-cluster DMA.

    Gathering B rotation matrices with XLA costs 1.69 ms at V=4096 on v5e
    (gather-latency-bound); this kernel instead uses the scalar-prefetched
    ``isel`` in the block index maps, so Mosaic pipelines one 65 KB
    rotation-row DMA per grid step — only the probed rows ever leave HBM.

    :param x2: [2, Dh] query halves
    :param isel: [2, B] int32 probed cluster ids per split
    :returns: (lut0 [B, F, S], lut1 [B, F, S]) float32
    """
    B = isel.shape[1]
    Dh = Cs.shape[2]
    F, S, Dsub = subs.shape[1], subs.shape[2], subs.shape[3]
    V = Cs.shape[1]
    subsq = jnp.sum(subs * subs, axis=-1)  # [2, F, S]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, B),
        in_specs=[
            pl.BlockSpec((2, Dh), lambda s, b, isel: (0, 0)),
            pl.BlockSpec((1, 1, 1, Dh),
                         lambda s, b, isel: (s, isel[s, b], 0, 0)),
            pl.BlockSpec((1, 1, 1, Dh),
                         lambda s, b, isel: (s, isel[s, b], 0, 0)),
            pl.BlockSpec((1, 1, F, Dsub, Dh),
                         lambda s, b, isel: (s, isel[s, b], 0, 0, 0)),
            pl.BlockSpec((1, F, S, Dsub), lambda s, b, isel: (s, 0, 0, 0)),
            pl.BlockSpec((1, F, S), lambda s, b, isel: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, F, S), lambda s, b, isel: (s, b, 0, 0)),
    )
    out = pl.pallas_call(
        _lut_kernel,
        out_shape=jax.ShapeDtypeStruct((2, B, F, S), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(isel, x2, Cs.reshape(2, V, 1, Dh), mus.reshape(2, V, 1, Dh),
      Rs.reshape(2, V, F, Dsub, Dh), subs, subsq)
    return out[0], out[1]


@functools.partial(
    jax.jit, static_argnames=("V", "B", "Q", "K", "SB", "lut_impl"))
def lopq_query(
    x,            # [D] float32 query (already PCA-projected if applicable)
    Cs,           # [2, V, Dh] coarse codebooks
    Rs,           # [2, V, Dh, Dh] local rotations (apply as R @ r)
    mus,          # [2, V, Dh] residual means
    subs,         # [2, F, S, Dsub] subquantizer codebooks
    codes,        # [N, M] uint8 PQ codes, rows sorted by cell id
    cell_start,   # [V^2 + 1] int32 CSR offsets, or None (wide-V mode)
    quota,        # traced int: stop probing cells once covered
    cells_sorted=None,  # [N] int32 sorted cell ids — required when
    #                     cell_start is None (wide-V searchsorted mode)
    *,
    V: int,
    B: int,       # probed clusters per split (B*B candidate cells)
    Q: int,       # candidate budget (static padding)
    K: int,       # results to return
    SB: int = 0,  # edge-strip depth (see below); 0 = square-only grid
    lut_impl: str = "stream",  # "stream" | "pallas" | "auto"
):
    """Returns (top_rows [K] int32, top_dists [K] f32, n_candidates, n_cells,
    grid_ok).

    Rows index into the sorted ``codes`` array; invalid slots are -1/+inf.
    ``grid_ok`` certifies the grid restriction was lossless for this
    query: the quota-crossing cell's approximate distance did not exceed
    the cheapest cell OUTSIDE the probed region, so the cells visited are
    exactly the ones the reference's unrestricted multisequence walk
    (lopq/lopq/search.py:13-135) would have visited. When it is False the
    caller escalates to a wider rung (see escalate_probe).

    ``SB`` > 0 augments the B x B square with two FULL-LENGTH edge strips
    of depth SB — all cells with rank < SB on either axis. The walk's
    region {(a, b): td0[a] + td1[b] <= theta} is hyperbola-shaped: most of
    its area sits in a compact corner square, but it has long thin ARMS
    along the axes (cells pairing a very low rank on one axis with a high
    rank on the other). A square-only cut provably misses those arms — at
    the 10M/V=4096 benchmark config the square certificate fails for
    ~100% of queries at B=256 even though the quota is met, forcing every
    query to a 1M-cell B=1024 grid — while a 128x128 square + 16-deep
    strips covers the true region for 100% of measured queries in ~147k
    cells (study: docs/BENCHMARKS.md probe-geometry section). The strip
    region keeps the row structure the sort-free threshold path needs:
    every row's allowed column set is a PREFIX of the td1 ranking, so all
    per-row binary searches work unchanged on ragged row widths.
    """
    F = subs.shape[1]          # fine splits per half
    S = subs.shape[2]          # subquantizer clusters
    Dsub = subs.shape[3]
    Dh = Cs.shape[2]
    x2 = x.reshape(2, Dh)
    if B >= V:
        SB = 0  # full square grid: strips are redundant
    SB = min(SB, B)
    strips = SB > 0

    # --- 1. coarse distances, top-B per split ------------------------------
    def split_dists(s):
        diff = x2[s][None, :] - Cs[s]
        return jnp.sum(diff * diff, axis=1)  # [V]

    d0, d1 = split_dists(0), split_dists(1)
    if strips:
        # Strips reach ranks up to SL = min(8B, V): rank order per half to
        # SL(+1 for the certificate's strip-end corner).
        SLc = min(8 * B, V)
        Bf = min(SLc + 1, V)
        nd0f, i0f = jax.lax.top_k(-d0, Bf)
        nd1f, i1f = jax.lax.top_k(-d1, Bf)
        td0f, td1f = -nd0f, -nd1f
        i0, i1 = i0f[:B], i1f[:B]
        td0, td1 = td0f[:B], td1f[:B]
        # Cheapest cell outside the square-plus-strips region: the
        # uncovered set within the SL bound has its minimum at one of the
        # two inner corners; the strip-end corners price the cells beyond
        # the SL bound (only when the bound bites, SL < V).
        out_grid_min = jnp.minimum(td0f[B] + td1f[SB], td0f[SB] + td1f[B])
        if SLc < V:
            out_grid_min = jnp.minimum(
                out_grid_min,
                jnp.minimum(td0f[0] + td1f[SLc], td0f[SLc] + td1f[0]))
    else:
        # One extra rank per split prices the cheapest OUT-of-grid cell
        # for the grid_ok certificate.
        Bx = min(B + 1, V)
        nd0, i0x = jax.lax.top_k(-d0, Bx)  # ascending distances
        nd1, i1x = jax.lax.top_k(-d1, Bx)
        i0, i1 = i0x[:B], i1x[:B]
        td0, td1 = -nd0[:B], -nd1[:B]
        if Bx > B:
            out_grid_min = jnp.minimum(-nd0[B] + td1[0], td0[0] + -nd1[B])
        else:
            out_grid_min = jnp.float32(jnp.inf)  # full grid: no restriction

    # --- 2. probed cell region in multisequence visit order ----------------
    G = B * B
    grid = td0[:, None] + td1[None, :]              # [B, B]
    sort_grid = G <= 16384 and not strips
    if sort_grid:
        # lax.top_k returns its k results sorted ascending in distance —
        # exactly the multisequence visitation order — and is markedly
        # cheaper than a full argsort of the grid on TPU.
        flat = grid.reshape(-1)
        neg_sorted, order = jax.lax.top_k(-flat, G)
        a_idx, b_idx = order // B, order % B         # slots into i0 / i1
        cell_ids = i0[a_idx] * V + i1[b_idx]         # [G] global cell ids

    # --- 3. ragged buckets -> fixed Q candidate slots ----------------------
    j = jnp.arange(Q, dtype=jnp.int32)
    if sort_grid:
        if cell_start is None:
            # Wide-V fallback: no dense offsets table (a [V^2+1] int32
            # table costs 1 GB at V=16384). The CSR rows are cell-sorted,
            # so a probed cell's bucket is the searchsorted range over the
            # sorted cell-id array — ~log2(N) gather passes over B*B keys,
            # once per query, instead of O(V^2) resident memory. Sentinel
            # (V*V) padding rows sort after every real cell and are never
            # matched.
            starts = jnp.searchsorted(cells_sorted, cell_ids,
                                      side="left").astype(jnp.int32)
            ends = jnp.searchsorted(cells_sorted, cell_ids,
                                    side="right").astype(jnp.int32)
            counts = ends - starts                   # [B*B]
        else:
            # One 2-wide sliced gather for (start, end) per probed cell
            # instead of two scalar gathers from the [V^2+1] offsets table.
            bounds = cell_start[
                cell_ids[:, None]
                + jnp.arange(2, dtype=jnp.int32)[None, :]]      # [B*B, 2]
            starts = bounds[:, 0]
            counts = bounds[:, 1] - starts           # [B*B]
        csum = jnp.cumsum(counts)
        # Visit cells in order until the quota is covered; the crossing
        # cell is included whole (reference get_result_quota semantics).
        selected = (csum - counts) < quota
        sel_counts = jnp.where(selected, counts, 0)
        scs = jnp.cumsum(sel_counts)
        total = scs[-1]
        n_cells = jnp.sum(selected.astype(jnp.int32))
        # grid_ok: the last visited cell is still cheaper than anything the
        # grid restriction cut off (ties break toward ok, matching the
        # arbitrary tie order of the reference's heap).
        d_stop = -neg_sorted[jnp.maximum(n_cells - 1, 0)]
        # Candidate slot j belongs to the cell whose cumulative range covers
        # j: b_for_j = #{cells i with scs[i] <= j} (== searchsorted(scs, j,
        # 'right'), but computed as one scatter-add of cell-end markers + a
        # cumsum — ~25x faster than the gather-heavy binary search on TPU).
        markers = jnp.zeros(Q + 1, jnp.int32).at[jnp.minimum(scs, Q)].add(1)
        b_for_j = jnp.cumsum(markers)[:Q]
        b_for_j = jnp.minimum(b_for_j, G - 1)
        # Per-cell metadata packed into one row-gatherable table: one [Q, 8]
        # row gather replaces five [Q]-element scalar gathers.
        meta = jnp.stack(
            [scs, sel_counts, starts, a_idx, b_idx,
             jnp.zeros_like(scs), jnp.zeros_like(scs), jnp.zeros_like(scs)],
            axis=1)                                   # [G, 8]
        mrow = meta[b_for_j]                          # [Q, 8]
        bucket_begin = mrow[:, 0] - mrow[:, 1]
        rows = mrow[:, 2] + (j - bucket_begin)
        slot0 = mrow[:, 3]                            # [Q] index into lut0
        slot1 = mrow[:, 4]
    elif strips:
        # Square-plus-strips region, SORTED like the narrow path. The
        # region is small enough to sort (G ~ 30k-500k vs the square wide
        # rungs' 1M+): one multi-payload lax.sort replaces the wide
        # path's 31-step threshold bisection, whose serialized per-row
        # binary searches were latency-bound on TPU (measured 21 ms at
        # G=82k vs 5.8 ms for a 65k square). Ties follow sort order =
        # the reference heap's arbitrary tie order, exactly like the
        # narrow rung. Strip length is bounded to SL = min(8B, V): the
        # region's arms taper, and cells beyond SL are priced into the
        # certificate's out-of-region minimum.
        SL = min(8 * B, V)
        s1 = SB * SL                   # top strip cells
        s2 = s1 + (B - SB) * B         # + square remainder
        G = s2 + (SL - B) * SB         # + left strip
        g = jnp.arange(G, dtype=jnp.int32)
        rg = jnp.where(
            g < s1, g // SL,
            jnp.where(g < s2, SB + (g - s1) // B, B + (g - s2) // SB))
        cg = jnp.where(
            g < s1, g % SL,
            jnp.where(g < s2, (g - s1) % B, (g - s2) % SB))
        gridf = td0f[rg] + td1f[cg]                   # [G]
        cidf = i0f[rg] * V + i1f[cg]                  # [G] global cell ids
        if cell_start is None:
            startsf = jnp.searchsorted(cells_sorted, cidf,
                                       side="left").astype(jnp.int32)
            ends = jnp.searchsorted(cells_sorted, cidf,
                                    side="right").astype(jnp.int32)
            cntf = ends - startsf
        else:
            # Two flat [G] gathers, NOT a [G, 2] sliced gather: TPU tile
            # layout pads the minor dim 128x, so under a serving vmap the
            # [G, 2] form allocates ~wave * G * 256 bytes — a 32 GB OOM at
            # rung (512, 32) with a 128-query wave (seen in the r04 4M
            # adversarial sweep). Same fix as the wide square path below.
            startsf = cell_start[cidf]
            cntf = cell_start[cidf + 1] - startsf
        # One sort carries every payload the slot machinery needs. A
        # (key, index)-only sort with post-sort gathers was tried and
        # REVERTED: rung latency is comparison-bound, not
        # operand-movement-bound — the 2-operand variant measured ~9%
        # SLOWER (41.7 vs 38.1 ms/query at rung (512,32), 10.5M) because
        # the [G] permutation gather it needs costs more than the three
        # payloads it saves. ~75 ns per region cell stands as the rung
        # cost (benchmarks/r04_probe_rung_10Mi.json); wide rungs are
        # escaped via the brute plan at huge quotas, not by shaving the
        # sort.
        gr_s, cnt_s, starts_s, rg_s, cg_s = jax.lax.sort(
            (gridf, cntf, startsf, rg, cg), num_keys=1)
        csum = jnp.cumsum(cnt_s)
        selected = (csum - cnt_s) < quota
        sel_counts = jnp.where(selected, cnt_s, 0)
        scs = jnp.cumsum(sel_counts)
        total = scs[-1]
        n_cells = jnp.sum(selected.astype(jnp.int32))
        d_stop = gr_s[jnp.maximum(n_cells - 1, 0)]
        markers = jnp.zeros(Q + 1, jnp.int32).at[jnp.minimum(scs, Q)].add(1)
        b_for_j = jnp.cumsum(markers)[:Q]
        b_for_j = jnp.minimum(b_for_j, G - 1)
        bucket_begin = scs[b_for_j] - sel_counts[b_for_j]
        rows = starts_s[b_for_j] + (j - bucket_begin)
        slot0 = rg_s[b_for_j]                         # ranks into i0f/i1f
        slot1 = cg_s[b_for_j]
    else:
        # Sort-free quota prefix: theta = the smallest grid distance whose
        # <=-cumulative candidate count reaches the quota — exactly the
        # distance of the reference walk's quota-crossing cell
        # (lopq/lopq/search.py:110-135), with distance ties at theta
        # included whole (the reference's heap breaks such ties
        # arbitrarily).
        #
        # ROW STRUCTURE is the whole trick: grid[a, b] = td0[a] + td1[b]
        # with td1 ascending, and IEEE addition is monotone — so every row
        # of the grid is ascending, and every grid-wide reduction the
        # masked-sum formulation needed (31 bisection passes over [G],
        # two [G] cumsums, a [G]-scatter slot map — ~60 full-grid passes,
        # 4.4 s per 100-query wave at B=1024) collapses to per-ROW binary
        # searches against ONE row-cumsum table:
        #   weighted_count(t) = sum_a P[a, #{b: grid[a,b] <= t} - 1]
        # where P = cumsum(counts, axis=1). Total [G]-scale work: the grid
        # eval, one counts gather, one row cumsum. Everything else is
        # O(B log B) or O(Q log B).
        cell2d = i0[:, None] * V + i1[None, :]        # [B, B] cell ids
        if cell_start is None:
            cflat = cell2d.reshape(-1)
            cnt2d = (jnp.searchsorted(cells_sorted, cflat, side="right")
                     - jnp.searchsorted(cells_sorted, cflat, side="left")
                     ).astype(jnp.int32).reshape(B, B)
        else:
            # Two flat [G] gathers ([G, 2] sliced gathers tile-pad their
            # minor dim 128x on TPU: a 32 GB allocation at B=1024 under a
            # 64-query vmap).
            c2f = cell2d.reshape(-1)
            cnt2d = (cell_start[c2f + 1]
                     - cell_start[c2f]).reshape(B, B)
        P = jnp.cumsum(cnt2d, axis=1, dtype=jnp.int32)    # [B, B]
        Pf = P.reshape(-1)
        gridf = grid.reshape(-1)                          # [G] f32
        rowa = jnp.arange(B, dtype=jnp.int32)
        total_grid = jnp.sum(P[:, -1])
        quota_eff = jnp.minimum(quota, total_grid)

        def _row_k(t, strict):
            """Per row a: #{b: grid[a, b] <= t} (< t when strict), via
            vectorized binary search down the ascending rows."""
            lo = jnp.zeros((B,), jnp.int32)
            hi = jnp.full((B,), B, jnp.int32)
            base = rowa * B

            def stp(_, lh):
                lo_, hi_ = lh
                mid = (lo_ + hi_) // 2
                # A row converged at k=B keeps mid=B on spare iterations:
                # clamp the read and force the left branch (virtual +inf
                # sentinel) so the state stays (B, B).
                v = gridf[base + jnp.minimum(mid, B - 1)]
                left = (v >= t) if strict else (v > t)
                left = left | (mid >= B)
                return (jnp.where(left, lo_, mid + 1),
                        jnp.where(left, mid, hi_))

            lo, hi = jax.lax.fori_loop(0, int(B).bit_length(), stp,
                                       (lo, hi))
            return lo                                     # [B]

        def _wsum(k):
            """Candidates in the per-row prefixes ``k`` ([B] cell counts)."""
            return jnp.sum(jnp.where(
                k > 0, Pf[rowa * B + jnp.maximum(k - 1, 0)], 0))

        # Exact bisection on f32 bit patterns (order-isomorphic to int32
        # for non-negative floats): lands on a PRESENT grid distance.
        fb2d = jax.lax.bitcast_convert_type(grid, jnp.int32)

        def _bisect(_, lh):
            lo, hi = lh
            mid = lo + (hi - lo) // 2
            t = jax.lax.bitcast_convert_type(mid, jnp.float32)
            ge = _wsum(_row_k(t, strict=False)) >= quota_eff
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        _, thr = jax.lax.fori_loop(
            0, 31, _bisect, (jnp.min(fb2d), jnp.max(fb2d)))
        d_stop = jax.lax.bitcast_convert_type(thr, jnp.float32)
        kr = _row_k(d_stop, strict=False)   # cells (incl. empty) <= theta
        kl = _row_k(d_stop, strict=True)    # strictly-cheaper (interior)
        c_all = jnp.where(kr > 0, Pf[rowa * B + jnp.maximum(kr - 1, 0)], 0)
        c_int = jnp.where(kl > 0, Pf[rowa * B + jnp.maximum(kl - 1, 0)], 0)
        c_bnd = c_all - c_int
        total = jnp.sum(c_all)
        n_cells = jnp.sum(kr)
        # Slot layout: interior candidates first (their total is < quota
        # <= Q by construction, so the Q clip can never drop one),
        # boundary (== theta) candidates after — preserving the sorted
        # path's property that only crossing-cell members are ever
        # clipped. Within a segment, slots fill row-major; the SET, not
        # the order, feeds the ADC top-K.
        int_begin = jnp.cumsum(c_int) - c_int             # [B] absolute
        n_int = jnp.sum(c_int)
        bnd_begin = n_int + jnp.cumsum(c_bnd) - c_bnd     # [B] absolute
        begins = jnp.concatenate([int_begin, bnd_begin])  # [2B] ascending

        def _first_gt(table, base, size, tgt):
            """Per slot: first index i in [0, size] with table[base + i]
            > tgt; index size acts as a virtual +inf sentinel (no such
            in-range entry). ``size`` is a static host int (works for
            non-power-of-two B — e.g. a top rung clamped to V)."""
            lo = jnp.zeros_like(tgt)
            hi = jnp.full_like(tgt, jnp.int32(size))

            def stp(_, lh):
                lo_, hi_ = lh
                mid = (lo_ + hi_) // 2
                # Spare iterations after converging at mid=size: clamp the
                # read and force the left branch (sentinel is > tgt).
                v = table[base + jnp.minimum(mid, size - 1)]
                gt = (v > tgt) | (mid >= size)
                return (jnp.where(gt, lo_, mid + 1),
                        jnp.where(gt, mid, hi_))

            lo, hi = jax.lax.fori_loop(0, int(size).bit_length(), stp,
                                       (lo, hi))
            return lo

        # Virtual row (interior rows then boundary rows): the last entry
        # of ``begins`` <= j. Zero-count rows share their successor's
        # begin and are skipped by the search automatically.
        v_j = jnp.maximum(
            _first_gt(begins, jnp.zeros_like(j), 2 * B, j)
            - 1, 0)
        is_bnd = v_j >= B
        a_j = jnp.minimum(jnp.where(is_bnd, v_j - B, v_j), B - 1)
        # Candidate offset within row a's ALL-cells cumulative: interior
        # slots index the strict-prefix candidates directly; boundary
        # slots continue after the row's interior count.
        base_off = jnp.where(is_bnd, c_int[a_j], 0) + (j - begins[v_j])
        # Containing cell: first b with P[a, b] > offset (skips empties).
        b_j = jnp.minimum(
            _first_gt(Pf, a_j * B, B, base_off), B - 1)
        j_in_bucket = base_off - jnp.where(
            b_j > 0, Pf[a_j * B + jnp.maximum(b_j - 1, 0)], 0)
        cid_j = i0[a_j] * V + i1[b_j]                     # [Q] cell ids
        if cell_start is None:
            start_j = jnp.searchsorted(cells_sorted, cid_j,
                                       side="left").astype(jnp.int32)
        else:
            start_j = cell_start[cid_j]
        rows = start_j + j_in_bucket
        slot0 = a_j                                   # [Q] probed-rank ids
        slot1 = b_j
    grid_ok = d_stop <= out_grid_min
    valid = j < jnp.minimum(total, Q)
    rows = jnp.where(valid, rows, 0)

    # --- 4+5. per-candidate ADC distances ----------------------------------
    if codes.dtype == jnp.uint32:
        # Packed layout ([N, M/4] uint32): 4x fewer gathered elements; bytes
        # unpacked in-register (little-endian, matching the uint8 bitcast).
        packed = codes[rows]                          # [Q, M/4]
        shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
        bytes_ = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xFF)
        cand_codes = bytes_.reshape(rows.shape[0], -1).astype(jnp.int32)
    else:
        cand_codes = codes[rows].astype(jnp.int32)    # [Q, M]

    # One-hot LUT ADC only at moderate candidate budgets: the [Q, F*S]
    # one-hot (and the s32 broadcast XLA materializes to build it) scales
    # with Q x F x S per query — at quota=100k (Q~101376) under a
    # 128-query vmap that allocation alone is ~53 GB (seen in the r04 4M
    # adversarial sweep). Past the cutoff every path takes the streaming
    # rotated-residual route below (O(Q x Dh) transients).
    use_lut = sort_grid and Q <= 16384
    if use_lut:
        # ADC lookup tables for the probed clusters. "pallas": per-cluster
        # DMA kernel (fastest single-query path; not vmap-safe). "stream":
        # rotate residuals for ALL V clusters with one streaming batched
        # matvec, then gather the B probed [Dh] rows (cheap; gathering the
        # [Dh, Dh] rotation matrices themselves is pathological for XLA —
        # see module docstring perf notes). "auto" picks pallas on a TPU
        # backend, stream elsewhere.
        if lut_impl == "auto":
            lut_impl = "pallas" if pallas_compiled_ok() else "stream"
        if lut_impl == "pallas":
            lut0, lut1 = build_luts_pallas(
                x2, jnp.stack([i0, i1]), Cs, Rs, mus, subs,
                interpret=not pallas_compiled_ok())
        else:

            def build_lut(s, sel):
                r = x2[s][None, :] - Cs[s] - mus[s]    # [V, Dh]
                pr_all = jnp.einsum("vij,vj->vi", Rs[s], r,
                                    precision="highest")  # [V, Dh]
                prf = pr_all[sel].reshape(B, F, Dsub)
                diff = prf[:, :, None, :] - subs[s][None, :, :, :]
                return jnp.sum(diff * diff, axis=-1)   # [B, F, S]

            lut0 = build_lut(0, i0)
            lut1 = build_lut(1, i1)

        # One-hot MXU contraction per half: P[q, b] = sum_f lut[b, f,
        # code_qf]; the probed-slot column is then selected with a second
        # (tiny) one-hot multiply-reduce. 0/1 one-hots are exact in
        # bfloat16 and HIGHEST keeps the f32 table values exact through
        # the MXU.
        iota_s = jnp.arange(S, dtype=jnp.int32)
        oh0 = (cand_codes[:, :F, None] == iota_s).reshape(
            rows.shape[0], F * S).astype(jnp.bfloat16)
        oh1 = (cand_codes[:, F:, None] == iota_s).reshape(
            rows.shape[0], F * S).astype(jnp.bfloat16)
        P0 = jnp.einsum("qk,bk->qb", oh0, lut0.reshape(B, F * S),
                        precision="highest",
                        preferred_element_type=jnp.float32)   # [Q, B]
        P1 = jnp.einsum("qk,bk->qb", oh1, lut1.reshape(B, F * S),
                        precision="highest",
                        preferred_element_type=jnp.float32)
        iota_b = jnp.arange(B, dtype=jnp.int32)
        dists = (jnp.sum(P0 * (slot0[:, None] == iota_b), axis=1)
                 + jnp.sum(P1 * (slot1[:, None] == iota_b), axis=1))
    else:
        # Wide rungs: no LUT tables. Building [B, F, S] tables for 2B
        # probed clusters is mostly wasted at B=1024 (each query reads
        # ~Q*M of its 2M table entries), and the one-hot route's [Q, B]
        # products would materialize ~GBs per wave. Instead each
        # candidate's distance comes straight from its cluster's rotated
        # residual: one [V, Dh] rotation stream per half ([V, Dh] row
        # gathers are the cheap kind — module docstring), a [Q, Dh] row
        # gather, and a fused diff-square-sum per fine split. O(Q*D)
        # FLOPs, nothing bigger than [Q, Dh] materialized.
        def half_dists(s, isel, slot, cc):
            r = x2[s][None, :] - Cs[s] - mus[s]        # [V, Dh]
            pr_all = jnp.einsum("vij,vj->vi", Rs[s], r,
                                precision="highest")   # [V, Dh]
            pr = pr_all[isel[slot]]                    # [Q, Dh]
            acc = jnp.zeros(rows.shape[0], jnp.float32)
            for f in range(F):  # static unroll (F = M/2, small)
                subf = subs[s, f][cc[:, f]]            # [Q, Dsub]
                prf = jax.lax.dynamic_slice_in_dim(
                    pr, f * Dsub, Dsub, axis=1)        # [Q, Dsub]
                diff = prf - subf
                acc = acc + jnp.sum(diff * diff, axis=1)
            return acc

        isel0, isel1 = (i0f, i1f) if strips else (i0, i1)
        dists = (half_dists(0, isel0, slot0, cand_codes[:, :F])
                 + half_dists(1, isel1, slot1, cand_codes[:, F:]))
    dists = jnp.where(valid, dists, jnp.inf)

    top_neg, top_idx = jax.lax.top_k(-dists, K)
    top_rows = jnp.where(jnp.isfinite(top_neg), rows[top_idx], -1)
    return top_rows, -top_neg, total, n_cells, grid_ok


@functools.partial(
    jax.jit, static_argnames=("V", "B", "Q", "K", "R", "K_out", "SB", "lut_impl"))
def lopq_query_rerank(x, feats, Cs, Rs, mus, subs, codes, cell_start, order,
                      quota, cells_sorted=None, *, V: int, B: int, Q: int,
                      K: int, R: int, K_out: int = 0, SB: int = 0,
                      lut_impl: str = "stream"):
    """Probed ADC query + device-resident exact rerank in ONE program.

    The reference's production config serves with ``reranking: true``
    (reference: conf/conf_search_sbpycaffe_release.json:16): take the top
    ``rerank_nb`` ADC candidates, recompute exact distances against the
    stored features, and re-sort (reference:
    searcher_lopqhbase.py:862-912). There that is an HBase fetch plus a
    numpy loop per query; here the feature matrix is HBM-resident in
    insertion order (same row space as ``order``-mapped code rows), so the
    rerank is one [R, Dr] gather + one fused distance/top-k — no host
    round-trip and no extra dispatch.

    ``feats`` live in the model's *index* space (post-PCA for lopq_pca) —
    the space ``x`` is already projected into — so the recomputed
    distances are exact in that space. Distances are reported as L2 norms
    (not squared), matching the reference's ``np.linalg.norm``.

    :param feats: [cap, Dr] feature matrix, insertion-order rows
    :param R: rerank depth (static); candidates past R are dropped,
        exactly like the reference's ``order[:rerank_nb]``
    :param K_out: rows emitted after the re-sort (0 = all R). Serving
        callers only consume ``max_returned`` results, so emitting the
        top K_out of the reranked R shrinks both the device top-k and
        the packed device-to-host transfer ~R/K_out x.
    :returns: (rows [K_out or R] int32 insertion-order, exact_dists f32,
        total, n_cells, grid_ok)
    """
    rows, dists, total, n_cells, grid_ok = lopq_query(
        x, Cs, Rs, mus, subs, codes, cell_start, quota, cells_sorted,
        V=V, B=B, Q=Q, K=K, SB=SB, lut_impl=lut_impl)
    rows = jnp.where(rows >= 0, order[jnp.maximum(rows, 0)], -1)
    rR = rows[:R]
    cand = feats[jnp.maximum(rR, 0)].astype(jnp.float32)   # [R, Dr]
    diff = cand - x[None, :]
    exact = jnp.sqrt(jnp.sum(diff * diff, axis=1))
    exact = jnp.where(rR >= 0, exact, jnp.inf)
    top_neg, idx = jax.lax.top_k(-exact, min(K_out, R) if K_out else R)
    top_rows = jnp.where(jnp.isfinite(top_neg), rR[idx], -1)
    return top_rows, -top_neg, total, n_cells, grid_ok


# --------------------------------------------------------------------- brute
# Exact search over the resident rerank feature store. When the searcher
# serves with reranking (the reference's production config,
# conf/conf_search_sbpycaffe_release.json:16) the full index-space feature
# matrix is HBM-resident anyway — and on TPU one [N, Dr] x [Dr, NQ] MXU
# pass over it is CHEAPER than a wide probe rung: the matmul streams the
# matrix once per wave at HBM bandwidth (~12 ms for 10M x 256 f32, shared
# by every query in the wave), while the grid path pays ~70 ns per probed
# cell per query (measured, benchmarks/r04_probe_rung_10Mi.json) plus
# per-element gathers at ~8 ns (module docstring). It is also EXACT: the
# quota walk, the grid restriction, and the certificate all vanish — this
# is the quota -> nb limit of the reference's probe-then-rerank contract,
# returning true-L2 top-K (strictly better recall at equal-or-lower cost).
#
# Two stages keep it fast AND exact: a default-precision (bf16 on TPU)
# matmul preselects K_pre rows per query — distances use the identity
# ||f - x||^2 = ||f||^2 - 2 f.x + const(x), with ||f||^2 precomputed once
# per pack — then the K_pre survivors are re-scored in f32 (highest) and
# re-sorted, exactly like the reference's rerank of its ADC candidates
# (searcher_lopqhbase.py:862-912). K_pre >= 4x the emitted depth makes a
# bf16-preselect miss of a true top-K row practically impossible (bf16
# keeps ~3 significant decimal digits; candidates that close re-sort in
# the f32 stage anyway).


@functools.partial(jax.jit, static_argnames=("K_pre", "K_out", "QCH"))
def brute_query_batch(X, feats, feats_sq, nb, n_occ, *,
                      K_pre: int, K_out: int, QCH: int = 16):
    """Exact top-``K_out`` by true L2 over the resident feature store.

    :param X: [NQ, Dr] index-space queries (already normalized/projected)
    :param feats: [cap, Dr] insertion-order feature matrix (f32 or bf16)
    :param feats_sq: [cap] f32 precomputed row norms^2 (+inf on pad rows)
    :param nb: traced int32 — occupied rows (rows >= nb are capacity pads)
    :param n_occ: traced int32 — occupied cells, reported as ``visited``
    :param K_pre: preselect depth (>= K_out; typically the rerank depth)
    :param QCH: query-chunk size (bounds the [QCH, cap] score transient)
    :returns: packed [NQ, 2*K_out + 3] int32 (see pack_query_out); rows
        are INSERTION-order (feats row space = external row space, no
        ``order`` mapping), dists are true L2 norms.
    """
    NQ, Dr = X.shape
    cap = feats.shape[0]
    K_pre = min(K_pre, cap)
    K_out = min(K_out, K_pre)
    # The per-row top_k work exists for PAD rows too: a 1-query serving
    # wave padded to a 16-row chunk pays 16x the per-query selection
    # (~235 ms device at 10.5M — the r04 serving-10M p50). Chunk no
    # wider than the wave.
    QCH = min(QCH, max(NQ, 1))
    L = min(8192, cap)                      # top-k tile
    capL = ((cap + L - 1) // L) * L
    kt = min(K_pre, L)
    valid_row = jnp.arange(cap, dtype=jnp.int32)

    def one_chunk(Xc):                      # [QCH, Dr] -> [QCH, 2*K_out+3]
        # Preselect: default precision (bf16 passes on TPU) — ranking-only.
        # dot_general with a contracted axis (no .T / no dtype copy of the
        # multi-GB store: the query side is cast instead).
        S = jax.lax.dot_general(
            Xc.astype(feats.dtype), feats,
            (((1,), (1,)), ((), ()))).astype(jnp.float32)   # [QCH, cap]
        pre = feats_sq[None, :] - 2.0 * S
        pre = jnp.where((valid_row < nb)[None, :], pre, jnp.inf)
        if capL != cap:
            pre = jnp.pad(pre, ((0, 0), (0, capL - cap)),
                          constant_values=jnp.inf)
        pre = pre.reshape(Xc.shape[0], capL // L, L)
        negv, idx = jax.lax.top_k(-pre, kt)                 # [Q, C, kt]
        gidx = idx + (jnp.arange(capL // L, dtype=jnp.int32) * L)[None, :,
                                                                  None]
        negf, sel = jax.lax.top_k(negv.reshape(Xc.shape[0], -1), K_pre)
        rows_pre = jnp.take_along_axis(
            gidx.reshape(Xc.shape[0], -1), sel, axis=1)     # [Q, K_pre]
        rows_pre = jnp.where(jnp.isfinite(negf), rows_pre, 0)
        # Exact stage: f32 re-score of the K_pre survivors.
        cand = feats[rows_pre].astype(jnp.float32)          # [Q, K_pre, Dr]
        diff = cand - Xc[:, None, :]
        exact = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        exact = jnp.where(jnp.isfinite(negf), exact, jnp.inf)
        top_neg, ti = jax.lax.top_k(-exact, K_out)          # [Q, K_out]
        top_rows = jnp.where(jnp.isfinite(top_neg),
                             jnp.take_along_axis(rows_pre, ti, axis=1), -1)
        total = jnp.broadcast_to(nb.astype(jnp.int32), (Xc.shape[0],))
        ncl = jnp.broadcast_to(n_occ.astype(jnp.int32), (Xc.shape[0],))
        ok = jnp.ones((Xc.shape[0],), jnp.int32)
        return jax.vmap(pack_query_out)(top_rows, -top_neg, total, ncl, ok)

    pad_q = (-NQ) % QCH
    Xp = jnp.pad(X.astype(jnp.float32), ((0, pad_q), (0, 0)))
    out = jax.lax.map(one_chunk, Xp.reshape(-1, QCH, Dr))
    return out.reshape(NQ + pad_q, -1)[:NQ]


@functools.partial(jax.jit, static_argnames=("K_pre", "K_out", "QCH",
                                             "renorm"))
def fused_feat_brute(X, pca_P, pca_mu, feats, feats_sq, nb, n_occ, *,
                     K_pre: int, K_out: int, QCH: int = 16,
                     renorm: bool = False):
    """Raw features -> brute exact search in one program: L2-normalize,
    optional PCA (+renorm), then :func:`brute_query_batch` — the serving
    fast path's brute twin of :func:`fused_feat_query`."""
    X = X.astype(jnp.float32)
    Xn = X / jnp.maximum(jnp.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    if pca_P is not None:
        Xp = jnp.dot(Xn - pca_mu[None, :], pca_P, precision="highest")
        if renorm:
            Xp = Xp / jnp.maximum(
                jnp.linalg.norm(Xp, axis=1, keepdims=True), 1e-30)
        Xn = Xp
    return brute_query_batch(Xn, feats, feats_sq, nb, n_occ,
                             K_pre=K_pre, K_out=K_out, QCH=QCH)


#: Cost model for the plan choice (brute vs probe ladder), measured on
#: v5e at the 10M/V=4096 config (benchmarks/r04_probe_rung_10Mi.json:
#: rung latency ~= GRID_NS_FIXED + GRID_NS_PER_CELL * G). The brute pass
#: is PER-QUERY-LINEAR in index rows: the [N]-wide top_k selection
#: dominates, not the shared feature stream, so waves do NOT amortize it
#: (measured 14.3 ms/query at 10.5M x 256 in 100-query waves and
#: 1.33 ms/query at 1M — ~1.4 ns/row/query across a 10x size range).
#: Brute therefore wins only where the ladder is forced onto its widest
#: rungs (huge quotas) or the index is small; that is exactly the
#: quota=100k adversarial regime.
GRID_NS_PER_CELL = 70.0
GRID_NS_FIXED = 550e3
BRUTE_NS_PER_ROW = 1.4      # per query per indexed row (selection-bound)
BRUTE_NS_FIXED = 300e3


def rung_cells(spec, V):
    """Probed-region size G of a ladder rung."""
    B, SB = rung_parts(spec)
    B = min(B, V)
    if not SB or B >= V:
        return B * B
    SL = min(8 * B, V)
    return SB * SL + (B - SB) * B + (SL - B) * SB


def prefer_brute(ladder_tail, nq, nb, V):
    """True when one exact brute wave over the feature store is cheaper
    than the grid ladder's starting rung for this wave. ``ladder_tail``
    is the ladder from its floor rung on (empty -> brute wins by
    default). Both sides are per-query costs: the brute top_k is
    per-query-linear in rows (see BRUTE_NS_PER_ROW — waves do not
    amortize it), the grid rung is linear in its region cells. The
    store's feature width/dtype deliberately do not appear: the brute
    pass is selection-bound, not bandwidth-bound (r04 measurement)."""
    if not ladder_tail:
        return True
    brute_ns = BRUTE_NS_FIXED / max(nq, 1) + nb * BRUTE_NS_PER_ROW
    g = rung_cells(ladder_tail[0], V)
    grid_ns = GRID_NS_FIXED + GRID_NS_PER_CELL * g
    return brute_ns < grid_ns


#: Adaptive probe-width ladder. The reference's ``get_result_quota`` walks
#: the full V x V multisequence grid until the quota is covered
#: (lopq/lopq/search.py:110-135); the device kernel probes a static B x B
#: grid, so queries whose candidate count falls short (dense regions
#: exhaust a narrow grid) are automatically re-issued at the next width.
#: 1024 caps the ladder: the grid/meta buffers grow with B^2, and at
#: B=1024 the grid covers >=1M cells.
#: Rung spec: an int B (square B x B grid) or a (B, SB) tuple (square
#: plus SB-deep full-length edge strips — see lopq_query's SB param; the
#: strips cover the walk region's thin arms, which is what let every
#: square cert fail at production quotas). Strip depths follow the
#: measured certificate studies (B/16, floor 8).
PROBE_LADDER = (64, (128, 8), (256, 16), (512, 32), (1024, 64))


def rung_parts(spec):
    """(B, SB) of a ladder rung spec."""
    return spec if isinstance(spec, tuple) else (spec, 0)


def rung_floor(ladder, quota, nb, V, yield_est=None):
    """Quota-aware starting rung: the narrowest ladder width whose grid
    can plausibly contain the reference walk's quota crossing, so waves
    skip provably-hopeless narrow rungs instead of paying them every
    time (the round-3 economics failure: at quota=10k over a 10M index
    every query burned the B=64 pass, and at 1M occupancy all three
    rungs ran back-to-back per request).

    The walk visits ~``quota / yield`` cells before crossing (yield =
    candidates per visited cell — observed by escalate_probe at real
    quota crossings, or the uniform-occupancy prior nb/V^2 before any
    wave has run), and a staircase region of A cells needs grid legs of
    ~sqrt(2A) (anti-diagonal frontier). Escalation still guards
    correctness when the estimate is low — this only changes where the
    ladder STARTS.
    """
    if nb <= 0 or len(ladder) <= 1:
        return 0
    quota_eff = min(int(quota), int(nb))
    if quota_eff <= 0:
        return 0
    if yield_est is None or yield_est <= 0:
        # Cold start: begin NARROW. The tempting uniform-occupancy prior
        # (nb / V^2) underestimates probed-region yield ~80x on any
        # clustered corpus (probing visits the cells nearest the query,
        # which are the dense ones: observed ~5 cand/cell vs 0.06
        # uniform at 1M/V=4096) — it sent cold serving waves straight to
        # the widest rung, and the settle hint then IMPRINTED that rung
        # because the wave never saw a narrower one (r04 serving p50
        # 461 ms vs 124 in round 2). Escalation guarantees correctness;
        # the cost of starting narrow is one escalated first wave, after
        # which the yield EMA makes this floor real.
        return 0
    import math

    required_b = math.sqrt(2.0 * quota_eff / float(yield_est))
    for i, spec in enumerate(ladder):
        if rung_parts(spec)[0] >= required_b:
            return i
    return len(ladder) - 1


def probe_ladder(V, probe_width=None, ladder=PROBE_LADDER):
    """Rung specs to try in order; a manual ``probe_width`` pins a single
    square rung (the pre-escalation behavior, kept as a benchmarking
    knob)."""
    if probe_width:
        return (min(probe_width, V),)
    out = []
    for spec in ladder:
        b, sb = rung_parts(spec)
        b = min(b, V)
        sb = 0 if b >= V else min(sb, b)
        spec = (b, sb) if sb else b
        if spec not in out:
            out.append(spec)
    return tuple(out)


def escalate_probe(run_tier, ladder, n, quota, nb, K_pad):
    """Host-side escalation driver shared by the single-chip and sharded
    searchers: run ``run_tier(pending_idx, B)`` for successive ladder
    widths, re-issuing only the queries whose tier was insufficient — the
    device analogue of the reference's probe-until-quota loop
    (lopq/lopq/search.py:110-135). A tier is insufficient when the
    candidate total fell short of the (index-size-capped) quota, OR when
    the kernel's ``grid_ok`` certificate shows the B x B grid restriction
    cut off a cell the unrestricted multisequence walk would have visited
    before the quota crossing (see lopq_query).

    :param run_tier: (idx [k] int array, B) -> (rows [k, K_pad],
        dists [k, K_pad], total [k], ncells [k], grid_ok [k]) numpy arrays
    :returns: (rows [n, K_pad] int32, dists [n, K_pad] f32, ncells [n],
        frac_short_first — fraction of queries the FIRST ladder rung
        could not satisfy (escalation-count stats) — settle_tier: the
        smallest index into ``ladder`` at which >= 90% of the wave's
        queries were cumulatively satisfied (the rung the tier hint
        should start the next wave at; capped at the last rung) —
        yield_obs: mean candidates-per-visited-cell over satisfied
        queries (None if none were satisfied), feeding the searchers'
        quota-aware rung floor — and settled: whether the 90% threshold
        was reached at ANY rung. When False, settle_tier is the default
        last rung and the wave was an outlier (or the quota is
        unreachable); the searchers use this to avoid letting one
        outlier wave pin the tier hint to the widest rung.)
    """
    import numpy as np

    quota_eff = min(int(quota), nb)
    rows_b = np.full((n, K_pad), -1, np.int32)
    dists_b = np.full((n, K_pad), np.inf, np.float32)
    ncells_b = np.zeros(n, np.int64)
    pend = np.arange(n)
    frac_short_first = 0.0
    settle_tier = max(len(ladder) - 1, 0)
    settled = False
    yield_sum, yield_n = 0.0, 0
    for ti, B in enumerate(ladder):
        r, dd, tot, nc, ok = run_tier(pend, B)
        rows_b[pend], dists_b[pend], ncells_b[pend] = r, dd, nc
        tot = np.asarray(tot)
        nc = np.asarray(nc)
        short = (tot < quota_eff) | (np.asarray(ok) == 0)
        # Candidates-per-visited-cell, observed at the quota crossing of
        # every satisfied query: tot/nc is exactly "how dense is the index
        # where THIS query's walk goes", which the rung floor inverts into
        # the expected grid width the next wave needs.
        sat = ~short & (nc > 0)
        if sat.any():
            yield_sum += float((tot[sat] / nc[sat]).sum())
            yield_n += int(sat.sum())
        if ti == 0:
            frac_short_first = float(short.mean()) if n else 0.0
        if n and (n - int(short.sum())) >= 0.9 * n and not settled:
            settle_tier = ti
            settled = True
        if ti + 1 == len(ladder):
            break
        pend = pend[short]
        if len(pend) == 0:
            break
    yield_obs = (yield_sum / yield_n) if yield_n else None
    return (rows_b, dists_b, ncells_b, frac_short_first, settle_tier,
            yield_obs, settled)


@jax.jit
def pack_query_out(rows, dists, total, n_cells, grid_ok):
    """Pack query outputs into one int32 vector ([K] rows, [K] bitcast
    dists, [1] candidates-found, [1] visited-cells, [1] grid-ok) so the
    host needs a single blocking device-to-host sync instead of five
    (each sync costs ~27 ms through the dev relay; fewer round trips also
    help directly-attached chips). ``total``/``grid_ok`` ride along
    because the adaptive probe escalation (reference quota contract,
    lopq/lopq/search.py:110-135) re-issues any query whose candidate
    count fell short of the quota — or whose grid certificate failed —
    at a wider probe width."""
    return jnp.concatenate([
        rows,
        jax.lax.bitcast_convert_type(dists, jnp.int32),
        jnp.reshape(total, (1,)).astype(jnp.int32),
        jnp.reshape(n_cells, (1,)).astype(jnp.int32),
        jnp.reshape(grid_ok, (1,)).astype(jnp.int32)])


def unpack_query_out(packed, K_pad):
    """Host-side inverse of :func:`pack_query_out` (numpy).

    :returns: (rows [.., K], dists [.., K] f32, total [..],
        n_cells [..], grid_ok [..])
    """
    import numpy as np

    rows = packed[..., :K_pad]
    dists = np.ascontiguousarray(
        packed[..., K_pad:2 * K_pad]).view(np.float32)
    return (rows, dists, packed[..., 2 * K_pad],
            packed[..., 2 * K_pad + 1], packed[..., 2 * K_pad + 2])


@functools.partial(
    jax.jit,
    static_argnames=("V", "B", "Q", "K", "R", "K_out", "renorm", "SB", "lut_impl"))
def fused_feat_query(X, pca_P, pca_mu, Cs, Rs, mus, subs, codes, cell_start,
                     order, quota, feats=None, cells_sorted=None, *, V: int,
                     B: int, Q: int, K: int, R: int = 0, K_out: int = 0,
                     renorm: bool = False, SB: int = 0,
                     lut_impl: str = "stream"):
    """Raw extracted features -> packed search results in ONE program:
    L2-normalize, optional PCA projection (+renorm), vmapped probed query,
    optional exact rerank over the HBM-resident feature matrix, packed
    rows/dists/visited per query. The serving fast path — query features
    never visit the host between the extraction forward and the search
    (the reference round-trips through numpy between its featurizer and
    searcher, generic_searcher.py:343-414 + searcher_lopqhbase.py:
    833-857, and its rerank detours through an HBase fetch,
    searcher_lopqhbase.py:862-912).

    :param X: [NQ, D_feat] raw features (any float dtype; cast to f32)
    :param pca_P: [D_feat, D] projection or None (plain lopq model)
    :param feats: [cap, D] index-space feature matrix (insertion-order
        rows) — required when R > 0
    :param R: rerank depth; 0 disables rerank (see lopq_query_rerank)
    :param K_out: with R > 0, rows emitted after the device re-sort
        (0 = all R; see lopq_query_rerank)
    :returns: [NQ, 2*K+3] packed int32 (or [NQ, 2*(K_out or R)+3] when
        R > 0; rows, dists, total, n_cells, grid_ok — see pack_query_out)
    """
    X = X.astype(jnp.float32)
    Xn = X / jnp.maximum(jnp.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    if pca_P is not None:
        Xp = jnp.dot(Xn - pca_mu[None, :], pca_P, precision="highest")
        if renorm:
            Xp = Xp / jnp.maximum(
                jnp.linalg.norm(Xp, axis=1, keepdims=True), 1e-30)
        Xn = Xp

    def qfn(q):
        if R > 0:
            rows, dists, total, ncells, ok = lopq_query_rerank(
                q, feats, Cs, Rs, mus, subs, codes, cell_start, order,
                quota, cells_sorted, V=V, B=B, Q=Q, K=K, R=R, K_out=K_out,
                SB=SB, lut_impl=lut_impl)
        else:
            rows, dists, total, ncells, ok = lopq_query_orig(
                q, Cs, Rs, mus, subs, codes, cell_start, order, quota,
                cells_sorted, V=V, B=B, Q=Q, K=K, SB=SB,
                lut_impl=lut_impl)
        return pack_query_out(rows, dists, total, ncells, ok)

    return jax.vmap(qfn)(Xn)


@functools.partial(jax.jit,
                   static_argnames=("V", "B", "Q", "K", "SB", "lut_impl"))
def lopq_query_orig(x, Cs, Rs, mus, subs, codes, cell_start, order, quota,
                    cells_sorted=None, *, V: int, B: int, Q: int, K: int,
                    SB: int = 0, lut_impl: str = "stream"):
    """``lopq_query`` + mapping of sorted-row hits back to insertion-order
    row indices via the ``order`` permutation (see csr.append_and_build_csr).
    One jit: the gather fuses with the query instead of costing an extra
    dispatch per call."""
    rows, dists, total, n_cells, grid_ok = lopq_query(
        x, Cs, Rs, mus, subs, codes, cell_start, quota, cells_sorted,
        V=V, B=B, Q=Q, K=K, SB=SB, lut_impl=lut_impl)
    rows = jnp.where(rows >= 0, order[jnp.maximum(rows, 0)], -1)
    return rows, dists, total, n_cells, grid_ok
