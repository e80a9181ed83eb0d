"""Fused on-device LOPQ query: probe + gather + ADC + top-k in one jit.

This replaces the reference's host-side hot loops — heap-driven cell probing
(reference: lopq/lopq/search.py:110-135 ``get_result_quota``) and per-item
ADC distance sums with per-cluster LUT memoization
(reference: lopq/lopq/search.py:137-177 ``compute_distances``,
lopq/lopq/model.py:673-704 ``get_subquantizer_distances``) — with a single
static-shape XLA program:

1. coarse distances per split (two small matmuls),
2. top-B clusters per split; the B x B cell grid sorted by approximate
   distance is the multisequence visitation order,
3. ragged cell buckets resolved to a fixed candidate budget Q via cumsum +
   searchsorted over the CSR ``cell_start`` table,
4. ADC lookup tables built only for the 2B probed clusters,
5. distance = 8 LUT gathers per candidate, masked top-K.

The index layout is CSR: codes sorted by cell id with a [V^2 + 1] offsets
table, so a cell's bucket is one contiguous slice (the role the LMDB
prefix-scan plays in the reference, lopq/lopq/search.py:472-499).
"""

import functools

import jax
import jax.numpy as jnp



@functools.partial(
    jax.jit, static_argnames=("V", "B", "Q", "K"))
def lopq_query(
    x,            # [D] float32 query (already PCA-projected if applicable)
    Cs,           # [2, V, Dh] coarse codebooks
    Rs,           # [2, V, Dh, Dh] local rotations (apply as R @ r)
    mus,          # [2, V, Dh] residual means
    subs,         # [2, F, S, Dsub] subquantizer codebooks
    codes,        # [N, M] uint8 PQ codes, rows sorted by cell id
    cell_start,   # [V^2 + 1] int32 CSR offsets
    quota,        # traced int: stop probing cells once covered
    *,
    V: int,
    B: int,       # probed clusters per split (B*B candidate cells)
    Q: int,       # candidate budget (static padding)
    K: int,       # results to return
):
    """Returns (top_rows [K] int32, top_dists [K] f32, n_candidates, n_cells).

    Rows index into the sorted ``codes`` array; invalid slots are -1/+inf.
    """
    F = subs.shape[1]          # fine splits per half
    S = subs.shape[2]          # subquantizer clusters
    Dsub = subs.shape[3]
    Dh = Cs.shape[2]
    x2 = x.reshape(2, Dh)

    # --- 1. coarse distances, top-B per split ------------------------------
    def split_dists(s):
        diff = x2[s][None, :] - Cs[s]
        return jnp.sum(diff * diff, axis=1)  # [V]

    d0, d1 = split_dists(0), split_dists(1)
    nd0, i0 = jax.lax.top_k(-d0, B)  # ascending distances
    nd1, i1 = jax.lax.top_k(-d1, B)
    td0, td1 = -nd0, -nd1

    # --- 2. sorted B x B cell grid (multisequence order) -------------------
    # lax.top_k returns its k results sorted ascending in distance — exactly
    # the multisequence visitation order — and is markedly cheaper than a
    # full argsort of the grid on TPU.
    grid = td0[:, None] + td1[None, :]              # [B, B]
    flat = grid.reshape(-1)
    _, order = jax.lax.top_k(-flat, B * B)
    a_idx, b_idx = order // B, order % B             # slots into i0 / i1
    cell_ids = i0[a_idx] * V + i1[b_idx]             # [B*B] global cell ids

    # --- 3. ragged buckets -> fixed Q candidate slots ----------------------
    starts = cell_start[cell_ids]
    counts = cell_start[cell_ids + 1] - starts       # [B*B]
    csum = jnp.cumsum(counts)
    # Visit cells in order until the quota is covered; the crossing cell is
    # included whole (reference get_result_quota semantics).
    selected = (csum - counts) < quota
    sel_counts = jnp.where(selected, counts, 0)
    scs = jnp.cumsum(sel_counts)
    total = scs[-1]
    n_cells = jnp.sum(selected.astype(jnp.int32))

    j = jnp.arange(Q, dtype=jnp.int32)
    # Candidate slot j belongs to the cell whose cumulative range covers j:
    # b_for_j = #{cells i with scs[i] <= j} (== searchsorted(scs, j, 'right'),
    # but computed as one scatter-add of cell-end markers + a cumsum — ~25x
    # faster than the gather-heavy binary search on TPU).
    markers = jnp.zeros(Q + 1, jnp.int32).at[jnp.minimum(scs, Q)].add(1)
    b_for_j = jnp.cumsum(markers)[:Q]
    b_for_j = jnp.minimum(b_for_j, B * B - 1)
    bucket_begin = scs[b_for_j] - sel_counts[b_for_j]
    rows = starts[b_for_j] + (j - bucket_begin)
    valid = j < jnp.minimum(total, Q)
    rows = jnp.where(valid, rows, 0)

    # --- 4. ADC lookup tables for the probed clusters ----------------------
    def build_lut(s, sel):
        Csel = Cs[s][sel]                      # [B, Dh]
        r = x2[s][None, :] - Csel - mus[s][sel]
        pr = jnp.einsum("bij,bj->bi", Rs[s][sel], r,
                        precision="highest")   # [B, Dh] local frame
        prf = pr.reshape(B, F, Dsub)
        diff = prf[:, :, None, :] - subs[s][None, :, :, :]
        return jnp.sum(diff * diff, axis=-1)   # [B, F, S]

    lut0 = build_lut(0, i0)
    lut1 = build_lut(1, i1)

    # --- 5. ADC distances + masked top-K -----------------------------------
    if codes.dtype == jnp.uint32:
        # Packed layout ([N, M/4] uint32): 4x fewer gathered elements; bytes
        # unpacked in-register (little-endian, matching the uint8 bitcast).
        packed = codes[rows]                          # [Q, M/4]
        shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
        bytes_ = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xFF)
        cand_codes = bytes_.reshape(rows.shape[0], -1).astype(jnp.int32)
    else:
        cand_codes = codes[rows].astype(jnp.int32)    # [Q, M]
    slot0 = a_idx[b_for_j]                            # [Q] index into lut0
    slot1 = b_idx[b_for_j]
    f_idx = jnp.arange(F, dtype=jnp.int32)[None, :]   # [1, F]

    flat0 = lut0.reshape(B * F * S)
    flat1 = lut1.reshape(B * F * S)
    g0 = flat0[(slot0[:, None] * F + f_idx) * S + cand_codes[:, :F]]
    g1 = flat1[(slot1[:, None] * F + f_idx) * S + cand_codes[:, F:]]
    dists = jnp.sum(g0, axis=1) + jnp.sum(g1, axis=1)
    dists = jnp.where(valid, dists, jnp.inf)

    top_neg, top_idx = jax.lax.top_k(-dists, K)
    top_rows = jnp.where(jnp.isfinite(top_neg), rows[top_idx], -1)
    return top_rows, -top_neg, total, n_cells


@functools.partial(jax.jit, static_argnames=("V", "B", "Q", "K"))
def lopq_query_orig(x, Cs, Rs, mus, subs, codes, cell_start, order, quota,
                    *, V: int, B: int, Q: int, K: int):
    """``lopq_query`` + mapping of sorted-row hits back to insertion-order
    row indices via the ``order`` permutation (see csr.append_and_build_csr).
    One jit: the gather fuses with the query instead of costing an extra
    dispatch per call."""
    rows, dists, total, n_cells = lopq_query(
        x, Cs, Rs, mus, subs, codes, cell_start, quota, V=V, B=B, Q=Q, K=K)
    rows = jnp.where(rows >= 0, order[jnp.maximum(rows, 0)], -1)
    return rows, dists, total, n_cells
