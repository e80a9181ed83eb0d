"""Device-side CSR multi-index construction.

Packs PQ codes into the cell-sorted CSR layout the fused query kernel scans,
entirely on device: sort by cell id, gather codes into cell order, scatter
per-cell counts, prefix-sum offsets. Nothing crosses the host boundary — the
10M-code equivalent of the reference's LMDB ingest loop
(reference: lopq/lopq/search.py:445-470 ``LOPQSearcherLMDB.add_codes``) runs
as four XLA ops.
"""

import functools

import jax
import jax.numpy as jnp

# Cell id used for unoccupied capacity rows: sorts after every real cell and
# is excluded from the offsets table, so padding is never probed.
def _sentinel(V):
    return V * V


@functools.partial(jax.jit, static_argnames=("V",))
def build_csr_device(coarse, fine, V: int):
    """Build the CSR index on device.

    :param coarse: [N, 2] int32 coarse codes
    :param fine: [N, M] uint8/int32 fine codes
    :param V: coarse codebook size (static)
    :returns: (codes [N, M] uint8 cell-sorted,
               cell_start [V^2+1] int32 offsets,
               order [N] int32 — original row index of each sorted row)
    """
    cells = coarse[:, 0].astype(jnp.int32) * V + coarse[:, 1].astype(jnp.int32)
    order = jnp.argsort(cells, stable=True).astype(jnp.int32)
    codes = fine.astype(jnp.uint8)[order]
    # NB: a packed 4-codes-per-uint32 layout is supported by the query
    # kernel but measured ~0.4 ms slower on v5e (the in-register unpack
    # outweighs the reduced gather element count); uint8 stays the default.
    counts = jax.ops.segment_sum(
        jnp.ones_like(cells), cells, num_segments=V * V)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    return codes, cell_start, order


@functools.partial(jax.jit, static_argnames=("V", "wide"),
                   donate_argnums=(0, 1))
def append_and_build_csr(dev_cells, dev_fine, new_cells, new_fine, offset,
                         V: int, wide: bool = False):
    """Append a chunk into capacity buffers and rebuild the CSR — on device.

    The incremental-refresh path: the host uploads ONLY the new rows (the
    chunk may carry sentinel-padded tail rows so its shape is quantized);
    the 10M-row sort/gather/offsets run as XLA ops instead of shipping
    ~150 MB of re-packed index over PCIe per refresh.

    :param dev_cells: [cap] int32 cell ids, sentinel V*V on unoccupied rows
    :param dev_fine: [cap, M] uint8 fine codes (donated, updated in place)
    :param new_cells: [k] int32 chunk (sentinel-padded tail allowed)
    :param new_fine: [k, M] uint8 chunk
    :param offset: scalar int32 — number of occupied rows before the append
    :returns: (dev_cells, dev_fine, codes_sorted [cap, M],
               cell_start [V^2+1] int32, order [cap] int32 — insertion index
               of each sorted row)
    """
    dev_cells = jax.lax.dynamic_update_slice(dev_cells, new_cells, (offset,))
    dev_fine = jax.lax.dynamic_update_slice(dev_fine, new_fine,
                                            (offset, jnp.int32(0)))
    order = jnp.argsort(dev_cells, stable=True).astype(jnp.int32)
    codes = dev_fine[order]
    cells_sorted = dev_cells[order]
    if wide:
        # Wide-V mode: no dense offsets table (1 GB at V=16384) — the
        # query kernel searchsorts cells_sorted instead (tpu_query step 3).
        return dev_cells, dev_fine, cells_sorted, codes, None, order
    real = (dev_cells < _sentinel(V)).astype(jnp.int32)
    counts = jnp.zeros(V * V, jnp.int32).at[
        jnp.minimum(dev_cells, _sentinel(V) - 1)].add(real)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    return dev_cells, dev_fine, cells_sorted, codes, cell_start, order


@functools.partial(jax.jit, static_argnames=("V", "wide"),
                   donate_argnums=(0, 1))
def merge_append_csr(dev_cells, dev_fine, cells_sorted, codes_sorted,
                     order_sorted, cell_start_prev, new_cells, new_fine,
                     offset, V: int, wide: bool = False):
    """Incremental CSR refresh by LINEAR MERGE instead of a full re-sort.

    A refresh appends a small sorted chunk into an already-sorted view, so
    re-argsorting the whole capacity buffer (XLA sort is O(N log^2 N) —
    ~60 s at a 100M-row index, and it dominated the refresh cost) is
    wasted work. This merges in O(N): binary-search the chunk's cells into
    the sorted base to get each new row's merged slot, then build the
    merged arrays with one gather per output (base rows shift right by the
    number of new rows before them). Equal cells keep base-before-new
    order, preserving insertion-order semantics within a cell (the
    reference's LMDB append order, lopq/lopq/search.py:445-470).

    The sorted-view inputs are NOT donated: concurrent readers hold them
    in query snapshots (see LOPQSearcherTPU._snapshot).

    :param cells_sorted/codes_sorted/order_sorted: previous sorted view
    :param cell_start_prev: previous [V^2+1] offsets (counts derive from it
        — avoids a full-capacity scatter)
    :returns: same tuple shape as :func:`append_and_build_csr`
    """
    cap = dev_cells.shape[0]
    k = new_cells.shape[0]
    dev_cells = jax.lax.dynamic_update_slice(dev_cells, new_cells, (offset,))
    dev_fine = jax.lax.dynamic_update_slice(dev_fine, new_fine,
                                            (offset, jnp.int32(0)))

    ns = jnp.argsort(new_cells, stable=True).astype(jnp.int32)
    nkeys = new_cells[ns]
    ncodes = new_fine.astype(jnp.uint8)[ns]
    norder = offset + ns                       # insertion index per new row

    # Merged slot of each new row: base rows with cell <= key come first
    # (side='right'), plus the new rows already placed before it.
    base_rank = jnp.searchsorted(cells_sorted, nkeys, side="right"
                                 ).astype(jnp.int32)
    p_new = base_rank + jnp.arange(k, dtype=jnp.int32)

    # cnt[s] = #{new rows at slots <= s}: one scatter of the k chunk slots
    # + a prefix sum — a searchsorted over all cap slots lowers to ~13
    # gather passes and measured slower than the full sort it replaced.
    s = jnp.arange(cap, dtype=jnp.int32)
    p_clip = jnp.minimum(p_new, cap)           # overflow slots (sentinel
    markers = jnp.zeros(cap + 1, jnp.int32).at[p_clip].add(1)  # rows) drop
    cnt = jnp.cumsum(markers[:cap]).astype(jnp.int32)
    is_new = jnp.zeros(cap, bool).at[p_clip].set(
        True, mode="drop")                     # slot s holds a new row
    new_idx = jnp.minimum(jnp.maximum(cnt - 1, 0), k - 1)
    base_idx = jnp.minimum(s - cnt, cap - 1)
    cells2 = jnp.where(is_new, nkeys[new_idx], cells_sorted[base_idx])
    order2 = jnp.where(is_new, norder[new_idx], order_sorted[base_idx])
    # Codes resolve through ONE gather from a [cap+k, M] pool with a
    # per-slot source index — a broadcasted where over the [cap, M] uint8
    # matrix materializes a (8,128)-tiled temp that pads M=8 columns to
    # 128 (16x HBM, OOM at the 100M scale).
    src = jnp.where(is_new, cap + new_idx, base_idx)
    pool = jnp.concatenate([codes_sorted, ncodes])
    codes2 = pool[src]

    if wide:
        return dev_cells, dev_fine, cells2, codes2, None, order2
    # Counts update incrementally: previous counts + the chunk's real rows
    # (sentinel-padded tail rows excluded).
    counts = cell_start_prev[1:] - cell_start_prev[:-1]
    real_new = (nkeys < _sentinel(V)).astype(jnp.int32)
    counts = counts.at[jnp.minimum(nkeys, _sentinel(V) - 1)].add(real_new)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    return dev_cells, dev_fine, cells2, codes2, cell_start, order2


@functools.partial(jax.jit, donate_argnums=(0,))
def append_rows(buf, chunk, offset):
    """Slice a row chunk into a capacity buffer at ``offset`` — on device.

    Maintenance op for insertion-order side stores that ride along with
    the CSR index (the rerank feature matrix: rows never reorder, so an
    incremental refresh is one dynamic_update_slice instead of a rebuild).
    The buffer IS donated: a second store-sized copy per append OOMed the
    production config (2 x 11.8 GB at 10.5M x 256 f32 on a 15.75 GB
    chip) and halved the f32 capacity budget. Queries that raced the
    donation with a stale snapshot retry on a fresh one (see
    LOPQSearcherTPU search paths); already-dispatched reads are safe —
    the runtime sequences buffer reuse after prior consumers.
    """
    return jax.lax.dynamic_update_slice(buf, chunk, (offset, 0))
