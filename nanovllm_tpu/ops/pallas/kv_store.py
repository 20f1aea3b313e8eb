"""Paged KV-cache store kernel — the TPU equivalent of the reference's Triton
``store_kvcache_kernel`` (reference: nanovllm/layers/attention.py:10-40).

Writes new K/V rows into the pooled paged cache
``kv_pages [num_pages, page_size, 2*num_kv_heads, head_dim]`` (K at even
combined-head indices, V at odd — the layout the ragged-paged-attention
kernel reads). XLA's scatter is unusable here: on TPU it costs ~3.5 ms per
call regardless of row count (measured on v5e), and it runs once per layer
per step. This kernel replaces it with pipelined DMAs:

- **page items**: a full page worth of contiguous stream rows copied in one
  [page_size, 2Hk, D] DMA (prefill writes are page-aligned runs because
  prefix-cache hits are whole blocks). The copy may over-read the stream past
  the sequence's new tokens; those rows land in the sequence's own
  not-yet-used tail slots, which is safe.
- **row items**: single-token writes (decode steps, and the recompute-last-
  token case) as [2Hk, D] DMAs — legal because the trailing two dims stay
  whole (token position is a leading, untiled dim).

Items are processed on a static grid with an NSEM-deep DMA ring so copies
overlap; padded items issue harmless dummy reads to keep the ring uniform,
and the final step drains the ring.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 8


def _kernel(
    # scalar prefetch
    page_src_ref,   # i32[NP] stream row start of each full-page copy
    page_dst_ref,   # i32[NP] destination page id
    row_src_ref,    # i32[NS] stream row of each single-row write
    row_dst_page_ref,  # i32[NS]
    row_dst_pos_ref,   # i32[NS]
    counts_ref,     # i32[2] = (n_page_items, n_row_items)
    # tensors
    kv_new_hbm,     # [Tpad, 2Hk, D] combined new K/V rows
    pages_in,       # [num_pages, ps, 2Hk, D] (aliased to output)
    pages_out,
    # scratch
    dummy_s,        # VMEM [8, 2Hk, D]
    sems,           # DMA sems [NSEM]
    *,
    page_size: int,
    with_rows: bool = True,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    n_pages = counts_ref[0]
    n_rows = counts_ref[1]

    def item_dma(j):
        """(page_dma, row_dma, dummy_dma) descriptors for item j; exactly one
        is started/waited depending on j's class. ``with_rows=False`` builds
        no row descriptors at all — pools whose token dim is the second-minor
        (the int8 scale sidecar) cannot even express an unaligned row slice,
        so their single-row writes go through kv_store_rows_merge instead."""
        sem = sems.at[j % NSEM]
        jp = jnp.clip(j, 0, page_src_ref.shape[0] - 1)
        jr = jnp.clip(j - n_pages, 0, row_src_ref.shape[0] - 1)
        # stream segments are 8-aligned (ModelRunner.prepare pads per-seq
        # q-lens); the hint lets Mosaic slice int8 streams whose token dim
        # is the second-minor (the scale sidecar)
        page = pltpu.make_async_copy(
            kv_new_hbm.at[pl.ds(pl.multiple_of(page_src_ref[jp], 8),
                                page_size)],
            pages_out.at[page_dst_ref[jp]], sem)
        # width 8: int8 streams with a second-minor token dim (the scale
        # sidecar) tile (8, 128) and reject narrower slices
        dummy = pltpu.make_async_copy(kv_new_hbm.at[pl.ds(0, 8)], dummy_s, sem)
        if not with_rows:
            return page, dummy, dummy
        row = pltpu.make_async_copy(
            kv_new_hbm.at[row_src_ref[jr]],
            pages_out.at[row_dst_page_ref[jr], row_dst_pos_ref[jr]], sem)
        return page, row, dummy

    def start_item(j):
        page, row, dummy = item_dma(j)
        @pl.when(j < n_pages)
        def _():
            page.start()
        @pl.when((j >= n_pages) & (j < n_pages + n_rows))
        def _():
            row.start()
        @pl.when(j >= n_pages + n_rows)
        def _():
            dummy.start()

    def wait_item(j):
        page, row, dummy = item_dma(j)
        @pl.when(j < n_pages)
        def _():
            page.wait()
        @pl.when((j >= n_pages) & (j < n_pages + n_rows))
        def _():
            row.wait()
        @pl.when(j >= n_pages + n_rows)
        def _():
            dummy.wait()

    @pl.when(i >= NSEM)
    def _wait_prev():
        # ring slot reused: wait for the DMA issued NSEM steps ago
        wait_item(i - NSEM)

    start_item(i)

    @pl.when(i == n - 1)
    def _drain():
        # wait the last min(n, NSEM) items (one outstanding DMA per used slot)
        for s in range(NSEM):
            j = n - NSEM + s
            if j >= 0:
                wait_item(j)


@functools.partial(jax.jit, static_argnames=("page_size", "interpret",
                                             "with_rows"))
def kv_store(
    kv_pages,        # [num_pages, ps, 2Hk, D]
    kv_new,          # [Tpad, 2Hk, D] — rows [t] = interleaved k/v heads
    page_src,        # i32[NP]
    page_dst,        # i32[NP]
    row_src,         # i32[NS]
    row_dst_page,    # i32[NS]
    row_dst_pos,     # i32[NS]
    counts,          # i32[2]
    *,
    page_size: int,
    interpret: bool = False,
    with_rows: bool = True,
):
    if kv_new.shape[0] < page_size:
        # page-item DMA descriptors are constructed (though never started)
        # even for all-row batches; keep the slice well-formed
        kv_new = jnp.pad(kv_new, ((0, page_size - kv_new.shape[0]), (0, 0), (0, 0)))
    NP = page_src.shape[0]
    NS = row_src.shape[0]
    n_items = NP + NS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8,) + kv_new.shape[1:], kv_new.dtype),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, page_size=page_size, with_rows=with_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=interpret,
    )(page_src, page_dst, row_src, row_dst_page, row_dst_pos, counts,
      kv_new, kv_pages)


# ----------------------------------------------------------- row-merge variant
def _merge_kernel(n_rows_ref, row_src_ref, row_dst_page_ref, row_dst_pos_ref,
                  rows_hbm, pool_in, pool_out, win_pool, win_src, win_out,
                  sems_in, sems_out, *, n_static: int):
    """Single-row writes into a pool whose TOKEN dim is the second-minor
    (the int8 KV-scale sidecar [P, ps, 128]): Mosaic forbids unaligned
    dynamic offsets there, so each row lands via read-merge-write on an
    8-row-aligned window, pipelined over an R-deep ring."""
    R = win_pool.shape[0]

    def win_of(pos):
        return pl.multiple_of(pos // 8 * 8, 8)

    def in_dmas(j):
        slot = j % R
        dst = pltpu.make_async_copy(
            pool_out.at[row_dst_page_ref[j], pl.ds(win_of(row_dst_pos_ref[j]), 8)],
            win_pool.at[slot], sems_in.at[slot, 0])
        src = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(win_of(row_src_ref[j]), 8)],
            win_src.at[slot], sems_in.at[slot, 1])
        return dst, src

    def out_dma(j):
        slot = j % R
        return pltpu.make_async_copy(
            win_out.at[slot],
            pool_out.at[row_dst_page_ref[j], pl.ds(win_of(row_dst_pos_ref[j]), 8)],
            sems_out.at[slot])

    n_rows = n_rows_ref[0]
    LAG = 2  # in-flight read windows ahead of the merge stage (< R)

    def process(j):
        # slot j%R's previous out must land before we overwrite win_out
        if j >= R:
            @pl.when(j - R < n_rows)
            def _():
                out_dma(j - R).wait()

        @pl.when(j < n_rows)
        def _():
            a, b = in_dmas(j)
            a.wait()
            b.wait()
            slot = j % R
            # pick stream row (src % 8), place it at pool row (pos % 8)
            sub = jax.lax.broadcasted_iota(jnp.int32, win_src.shape[1:], 0)
            srow = jnp.sum(jnp.where(sub == row_src_ref[j] % 8,
                                     win_src[slot].astype(jnp.float32), 0.0),
                           axis=0, keepdims=True)
            win_out[slot] = jnp.where(
                sub == row_dst_pos_ref[j] % 8,
                jnp.broadcast_to(srow, win_pool.shape[1:]),
                win_pool[slot].astype(jnp.float32)).astype(pool_out.dtype)
            out_dma(j).start()

    for t in range(n_static + LAG):
        if t < n_static:
            @pl.when(t < n_rows)
            def _():
                a, b = in_dmas(t)
                a.start()
                b.start()
        if t - LAG >= 0:
            process(t - LAG)
    for j in range(max(0, n_static - R), n_static):
        @pl.when(j < n_rows)
        def _():
            out_dma(j).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_store_rows_merge(pool, rows, row_src, row_dst_page, row_dst_pos,
                        n_rows=None, *, interpret: bool = False):
    """Write row ``row_src[j]`` of ``rows`` to ``pool[row_dst_page[j],
    row_dst_pos[j]]`` for j < n_rows (default: all), via aligned-window
    read-merge-write. Items must target distinct pages (the engine's store
    tables guarantee it: one row per sequence, pages never shared while
    partially filled); masked-out items may share the garbage page, where
    lost updates are harmless."""
    B = row_src.shape[0]
    if n_rows is None:
        n_rows = jnp.full((1,), B, jnp.int32)
    else:
        n_rows = jnp.asarray(n_rows, jnp.int32).reshape(1)
    if rows.shape[0] < 8:
        rows = jnp.pad(rows, ((0, 8 - rows.shape[0]), (0, 0)))
    R = 4
    L = pool.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((R, 8, L), pool.dtype),
            pltpu.VMEM((R, 8, L), rows.dtype),
            pltpu.VMEM((R, 8, L), pool.dtype),
            pltpu.SemaphoreType.DMA((R, 2)),
            pltpu.SemaphoreType.DMA((R,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_merge_kernel, n_static=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=interpret,
    )(n_rows, row_src, row_dst_page, row_dst_pos, rows, pool)


# ---------------------------------------------------------------- row variant
def _row_kernel(row_src_ref, row_dst_page_ref, row_dst_pos_ref,
                kv_new_hbm, pages_in, pages_out, sems, *, n_static: int):
    """Single-grid-step decode store: all row DMAs issued from one unrolled
    loop with an NSEM-deep ring (no per-item grid machinery). Masked-out rows
    are directed at a garbage page by the caller, so every row writes."""
    for j in range(n_static):
        if j >= NSEM:
            pltpu.make_async_copy(
                kv_new_hbm.at[row_src_ref[j - NSEM]],
                pages_out.at[row_dst_page_ref[j - NSEM], row_dst_pos_ref[j - NSEM]],
                sems.at[(j - NSEM) % NSEM]).wait()
        pltpu.make_async_copy(
            kv_new_hbm.at[row_src_ref[j]],
            pages_out.at[row_dst_page_ref[j], row_dst_pos_ref[j]],
            sems.at[j % NSEM]).start()
    for j in range(max(0, n_static - NSEM), n_static):
        pltpu.make_async_copy(
            kv_new_hbm.at[row_src_ref[j]],
            pages_out.at[row_dst_page_ref[j], row_dst_pos_ref[j]],
            sems.at[j % NSEM]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_store_rows(kv_pages, kv_new, row_src, row_dst_page, row_dst_pos,
                  *, interpret: bool = False):
    """Decode-only store: write row ``row_src[j]`` of kv_new to
    ``pages[row_dst_page[j], row_dst_pos[j]]`` for all j (callers direct
    masked-out rows at a garbage page). One grid step, unrolled DMA ring."""
    B = row_src.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    return pl.pallas_call(
        functools.partial(_row_kernel, n_static=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=interpret,
    )(row_src, row_dst_page, row_dst_pos, kv_new, kv_pages)


def build_store_tables(q_starts, q_lens, cached_lens, block_tables, page_size,
                       np_items, ns_items):
    """Host-side store tables.

    q_starts/q_lens: stream offsets/lengths of each seq's new tokens;
    cached_lens: tokens already present (page-multiple, or len-1 for the
    recompute-last-token case); block_tables: logical page ids per seq.
    """
    from nanovllm_tpu.utils.native import build_store_tables_native
    native = build_store_tables_native(q_starts, q_lens, cached_lens,
                                       block_tables, page_size, np_items, ns_items)
    if native is not None:
        return native
    page_src = np.zeros(np_items, np.int32)
    page_dst = np.zeros(np_items, np.int32)
    row_src = np.zeros(ns_items, np.int32)
    row_dst_page = np.zeros(ns_items, np.int32)
    row_dst_pos = np.zeros(ns_items, np.int32)
    np_count = 0
    ns_count = 0
    for i in range(len(q_lens)):
        qlen = int(q_lens[i])
        if qlen == 0:
            continue
        cached = int(cached_lens[i])
        table = block_tables[i]
        if qlen == 1:
            pos = cached  # the single new token's position
            row_src[ns_count] = q_starts[i]
            row_dst_page[ns_count] = table[pos // page_size]
            row_dst_pos[ns_count] = pos % page_size
            ns_count += 1
            continue
        assert cached % page_size == 0, (cached, page_size)
        first_page = cached // page_size
        n_pages = (qlen + page_size - 1) // page_size
        for j in range(n_pages):
            page_src[np_count] = q_starts[i] + j * page_size
            page_dst[np_count] = table[first_page + j]
            np_count += 1
    assert np_count <= np_items and ns_count <= ns_items
    counts = np.array([np_count, ns_count], np.int32)
    return page_src, page_dst, row_src, row_dst_page, row_dst_pos, counts
