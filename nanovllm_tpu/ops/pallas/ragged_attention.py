"""Ragged paged flash attention — the TPU replacement for flash-attn.

Two Pallas kernels replace the reference's two CUDA entry points
(flash_attn_varlen_func / flash_attn_with_kvcache, reference:
nanovllm/layers/attention.py:64-74):

**Prefill** (`ragged_paged_attention`): queries are a concatenated ragged
token stream [T, Hq, D]; each sequence's segment starts at a 16-row-aligned
offset (Mosaic requires provably tile-aligned DMA offsets — the host packs
the stream that way and the kernel asserts it via ``pl.multiple_of``). Work
is flattened into (sequence, q-block) items, scalar-prefetched, so the
static grid (num_items, Hk) wastes no iterations on ragged shapes. K/V are
read from the paged cache [Hk, S, D] via block tables with double-buffered
block DMAs and online softmax; prefix-cached context and fresh tokens are
handled uniformly.

**Decode** (`paged_decode_attention`): one query token per sequence. q
[B, Hq*D] is pipelined via BlockSpec in 16-row blocks (16 sequences per
grid step); each sequence runs its own double-buffered KV-block loop with
static row slicing (unrolled over the 16 rows).

GQA head groups are processed as lane-aligned [*, D] slices of [*, G*D]
tiles (Mosaic rejects sub-tile head-dim slices, so q/out travel as 2D
[T, Hq*D]).

Output-spill contract (prefill): a q-block DMA may write up to TQ rows past
its sequence's segment; the serial TPU grid guarantees the next item's
output DMA runs later and overwrites the spill, and inter-segment alignment
padding absorbs the rest.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30
SEG_ALIGN = 16  # host aligns each seq's q segment to this many rows


def _prefill_kernel(
    # scalar-prefetch refs (SMEM)
    item_seq_ref,      # i32[NW]
    item_qblock_ref,   # i32[NW]
    n_items_ref,       # i32[1]
    q_starts_ref,      # i32[B] 16-aligned segment starts
    q_lens_ref,        # i32[B] real (unpadded) q lengths
    ctx_ref,           # i32[B]
    block_tables_ref,  # i32[B, W]
    # tensor refs (HBM/ANY)
    q_hbm,             # [Tpad, Hq*D]
    k_hbm,             # [Hk, S, D]
    v_hbm,             # [Hk, S, D]
    out_hbm,           # [Tpad, Hq*D]
    # scratch
    q_s,               # VMEM [TQ, G*D]
    k_s,               # VMEM [2, BS, D]
    v_s,               # VMEM [2, BS, D]
    o_s,               # VMEM [TQ, G*D]
    acc_ref,           # VMEM [TQ, G*D] f32
    m_ref,             # VMEM [TQ, G*128] f32
    l_ref,             # VMEM [TQ, G*128] f32
    sems,              # DMA sems [6]
    *,
    scale: float,
    tq: int,
    block_size: int,
    num_groups: int,
    head_dim: int,
):
    i = pl.program_id(0)
    h = pl.program_id(1)
    G = num_groups
    BS = block_size
    D = head_dim

    @pl.when(i < n_items_ref[0])
    def _process():
        seq = item_seq_ref[i]
        jq = item_qblock_ref[i]
        qlen = q_lens_ref[seq]
        ctx = ctx_ref[seq]
        q_start = pl.multiple_of(q_starts_ref[seq] + jq * tq, SEG_ALIGN)
        # exclusive bound on kv positions any row in this q block may attend to
        kv_limit = ctx - qlen + jnp.minimum(jq * tq + tq, qlen)
        nkv = pl.cdiv(kv_limit, BS)

        q_dma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(q_start, tq), pl.ds(h * G * D, G * D)], q_s, sems.at[0])
        q_dma.start()

        def kv_dma(slot, j):
            off = pl.multiple_of(block_tables_ref[seq, j] * BS, SEG_ALIGN)
            return (
                pltpu.make_async_copy(k_hbm.at[h, pl.ds(off, BS), :], k_s.at[slot], sems.at[1 + slot]),
                pltpu.make_async_copy(v_hbm.at[h, pl.ds(off, BS), :], v_s.at[slot], sems.at[3 + slot]),
            )

        kd0, vd0 = kv_dma(0, 0)
        kd0.start()
        vd0.start()
        q_dma.wait()

        m_ref[...] = jnp.full(m_ref.shape, NEG_LARGE, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

        row_tok = jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0) + jq * tq
        q_pos = ctx - qlen + row_tok                      # [TQ, 1]
        row_valid = row_tok < qlen

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < nkv)
            def _prefetch():
                kd, vd = kv_dma(1 - slot, j + 1)
                kd.start()
                vd.start()

            kd, vd = kv_dma(slot, j)
            kd.wait()
            vd.wait()

            k = k_s[slot]
            v = v_s[slot]
            kv_pos = j * BS + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
            mask = (kv_pos <= q_pos) & row_valid          # [TQ, BS]

            for g in range(G):
                qg = q_s[:, g * D:(g + 1) * D]            # [TQ, D] lane-aligned
                s = jax.lax.dot_general(
                    qg, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale   # [TQ, BS]
                s = jnp.where(mask, s, NEG_LARGE)

                m_prev = m_ref[:, g * 128:(g + 1) * 128]          # [TQ, 128]
                l_prev = l_ref[:, g * 128:(g + 1) * 128]
                s_max = jnp.max(s, axis=1, keepdims=True)         # [TQ, 1]
                m_new = jnp.maximum(m_prev, s_max)
                corr = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new[:, :1])                     # [TQ, BS]
                l_ref[:, g * 128:(g + 1) * 128] = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
                m_ref[:, g * 128:(g + 1) * 128] = m_new
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # [TQ, D]
                acc = acc_ref[:, g * D:(g + 1) * D]
                acc_ref[:, g * D:(g + 1) * D] = acc * corr[:, :1] + pv
            return 0

        jax.lax.fori_loop(0, nkv, body, 0)

        for g in range(G):
            l = l_ref[:, g * 128:g * 128 + 1]                     # [TQ, 1]
            out = acc_ref[:, g * D:(g + 1) * D] / jnp.maximum(l, 1e-30)
            o_s[:, g * D:(g + 1) * D] = out.astype(o_s.dtype)
        o_dma = pltpu.make_async_copy(
            o_s, out_hbm.at[pl.ds(q_start, tq), pl.ds(h * G * D, G * D)], sems.at[5])
        o_dma.start()
        o_dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "tq", "block_size", "num_items", "interpret"))
def ragged_paged_attention(
    q,                  # [T, Hq, D] 16-aligned ragged stream
    k_cache,            # [Hk, S, D]
    v_cache,            # [Hk, S, D]
    q_starts,           # i32[B] aligned segment starts
    q_lens,             # i32[B] real q lengths
    context_lens,       # i32[B]
    block_tables,       # i32[B, W]
    item_seq,           # i32[NW]
    item_qblock,        # i32[NW]
    n_items,            # i32[1]
    *,
    scale: float,
    tq: int,
    block_size: int,
    num_items: int,
    interpret: bool = False,
):
    T, Hq, D = q.shape
    Hk = k_cache.shape[0]
    G = Hq // Hk
    assert Hq % Hk == 0 and D % 128 == 0
    assert tq % SEG_ALIGN == 0 and block_size % SEG_ALIGN == 0

    q2 = jnp.pad(q, ((0, tq), (0, 0), (0, 0))).reshape(T + tq, Hq * D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(num_items, Hk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tq, G * D), q.dtype),
            pltpu.VMEM((2, block_size, D), k_cache.dtype),
            pltpu.VMEM((2, block_size, D), v_cache.dtype),
            pltpu.VMEM((tq, G * D), q.dtype),
            pltpu.VMEM((tq, G * D), jnp.float32),
            pltpu.VMEM((tq, G * 128), jnp.float32),
            pltpu.VMEM((tq, G * 128), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )

    kernel = functools.partial(
        _prefill_kernel, scale=scale, tq=tq, block_size=block_size,
        num_groups=G, head_dim=D)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q2.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(item_seq, item_qblock, n_items, q_starts, q_lens, context_lens,
      block_tables, q2, k_cache, v_cache)
    return out[:T].reshape(T, Hq, D)


BQ = 16  # decode sequences per grid step (q block rows)


def _decode_kernel(
    ctx_ref,           # i32[B]
    block_tables_ref,  # i32[B, W]
    q_ref,             # VMEM [BQ, Hq*D]
    k_hbm,             # [Hk, S, D]
    v_hbm,             # [Hk, S, D]
    o_ref,             # VMEM [BQ, Hq*D]
    k_s,               # VMEM [2, BS, D]
    v_s,               # VMEM [2, BS, D]
    sems,              # DMA sems [4]
    *,
    scale: float,
    block_size: int,
    num_groups: int,
    head_dim: int,
):
    i = pl.program_id(0)
    h = pl.program_id(1)
    G = num_groups
    BS = block_size
    D = head_dim

    for r in range(BQ):  # unrolled: static row slices
        seq = i * BQ + r
        ctx = ctx_ref[seq]
        nkv = pl.cdiv(ctx, BS)

        def kv_dma(slot, j, seq=seq):
            off = pl.multiple_of(block_tables_ref[seq, j] * BS, SEG_ALIGN)
            return (
                pltpu.make_async_copy(k_hbm.at[h, pl.ds(off, BS), :], k_s.at[slot], sems.at[slot]),
                pltpu.make_async_copy(v_hbm.at[h, pl.ds(off, BS), :], v_s.at[slot], sems.at[2 + slot]),
            )

        kd0, vd0 = kv_dma(0, 0)
        kd0.start()
        vd0.start()

        pos = ctx - 1  # this token's position
        col = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)

        def body(j, carry):
            m, l, acc = carry  # [G,1]... packed as ([1,G*128], [1,G*128], [1,G*D])
            slot = j % 2

            @pl.when(j + 1 < nkv)
            def _prefetch():
                kd, vd = kv_dma(1 - slot, j + 1)
                kd.start()
                vd.start()

            kd, vd = kv_dma(slot, j)
            kd.wait()
            vd.wait()
            k = k_s[slot]
            v = v_s[slot]
            mask = (j * BS + col) <= pos                 # [1, BS]

            m_out = []
            l_out = []
            a_out = []
            for g in range(G):
                qg = q_ref[r:r + 1, pl.ds((h * G + g) * D, D)]  # [1, D]
                s = jax.lax.dot_general(
                    qg, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale            # [1, BS]
                s = jnp.where(mask, s, NEG_LARGE)
                m_prev = m[:, g * 128:(g + 1) * 128]
                l_prev = l[:, g * 128:(g + 1) * 128]
                s_max = jnp.max(s, axis=1, keepdims=True)
                m_new = jnp.maximum(m_prev, s_max)
                corr = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new[:, :1])
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)                    # [1, D]
                m_out.append(m_new)
                l_out.append(l_prev * corr + jnp.sum(p, axis=1, keepdims=True))
                a_out.append(acc[:, g * D:(g + 1) * D] * corr[:, :1] + pv)
            return (jnp.concatenate(m_out, axis=1),
                    jnp.concatenate(l_out, axis=1),
                    jnp.concatenate(a_out, axis=1))

        m0 = jnp.full((1, G * 128), NEG_LARGE, jnp.float32)
        l0 = jnp.zeros((1, G * 128), jnp.float32)
        a0 = jnp.zeros((1, G * D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nkv, body, (m0, l0, a0))

        for g in range(G):
            lg = l[:, g * 128:g * 128 + 1]
            out = acc[:, g * D:(g + 1) * D] / jnp.maximum(lg, 1e-30)
            o_ref[r:r + 1, pl.ds((h * G + g) * D, D)] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_size", "interpret"))
def paged_decode_attention(
    q,                  # [B, Hq, D]
    k_cache,            # [Hk, S, D]
    v_cache,            # [Hk, S, D]
    context_lens,       # i32[B]
    block_tables,       # i32[B, W]
    *,
    scale: float,
    block_size: int,
    interpret: bool = False,
):
    B, Hq, D = q.shape
    Hk = k_cache.shape[0]
    G = Hq // Hk
    assert Hq % Hk == 0 and D % 128 == 0

    Bp = (B + BQ - 1) // BQ * BQ
    q2 = jnp.pad(q.reshape(B, Hq * D), ((0, Bp - B), (0, 0)))
    ctx = jnp.pad(context_lens, (0, Bp - B), constant_values=1)
    tables = jnp.pad(block_tables, ((0, Bp - B), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // BQ, Hk),
        in_specs=[
            pl.BlockSpec((BQ, Hq * D), lambda i, h, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BQ, Hq * D), lambda i, h, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_size, D), k_cache.dtype),
            pltpu.VMEM((2, block_size, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel, scale=scale, block_size=block_size, num_groups=G,
        head_dim=D)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Hq * D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(ctx, tables, q2, k_cache, v_cache)
    return out[:B].reshape(B, Hq, D)


def build_item_tables(q_lens: np.ndarray, tq: int, num_items: int):
    """Host-side (numpy) work-item tables: one item per (seq, q-block of tq).

    Returns (item_seq [num_items], item_qblock [num_items], n_items [1]).
    """
    nb = (np.asarray(q_lens) + tq - 1) // tq
    total = int(nb.sum())
    assert total <= num_items, (total, num_items)
    item_seq = np.zeros(num_items, np.int32)
    item_qblock = np.zeros(num_items, np.int32)
    o = 0
    for i, n in enumerate(nb):
        item_seq[o:o + n] = i
        item_qblock[o:o + n] = np.arange(n, dtype=np.int32)
        o += int(n)
    return item_seq, item_qblock, np.array([total], np.int32)
