"""Decode-specialized paged flash attention (one new token per sequence).

The general in-tree ragged-paged-attention kernel carries machinery this
path never uses (ragged q streams, per-seq q-block loops, mixed
prefill+decode). This kernel is the decode fast path for the engine's
``lax.scan`` steps: q is exactly [B, Hq, D] (one token per lane), every
sequence reads its own pages, and the kernel is a DMA pipeline streaming KV
pages through VMEM at HBM bandwidth with an online-softmax accumulator in
scratch. Reference counterpart: flash_attn_with_kvcache (reference:
nanovllm/layers/attention.py:72-74), an external CUDA dependency there.

It is also the engine's integration point for sub-byte KV: ``kv_mode``

- ``dense``    — pool [P, ps, 2Hk, D] interleaved combined heads in
                 bf16 / int8 / fp8 with an optional global ``kv_scale``
                 (the layout the library kernel reads).
- ``int8_rs``  — int8 pool + per-(row, head) bf16 scales in a sidecar
                 ``kv_scales [P, ps, SW]`` (SW = 128-lane-padded width:
                 Mosaic's DMA slicer requires 128-lane-minor blocks).
                 Fixes the global-scale clipping hazard on unnormalized
                 V rows. Pool head axis is **K-first** ([0:Hk] = K heads,
                 [Hk:] = V), so K and V are contiguous lane slices of the
                 flat row.
- ``int4_rs``  — packed pool [P, ps, Hk, D]: byte b = 16*V + K
                 (K, V in [-7, 7]) + the same per-row scales. Halves
                 decode HBM traffic vs int8. K is never unpacked:
                 q·K = q·b - 16*(q·V).

Design lessons from the v1-v3 post-mortems (hardware-measured at
B=256/ctx=1k int8, tuned library kernel = 0.72 ms):

- **Lane grouping** (v2): grid is (B / lanes_per_step,), not (B,) — v1's
  256 sequential grid steps paid ~12 us of per-step overhead each (3.1 ms).
- **Chunk-outer pipelining** (v4): v2/v3 processed each lane to completion
  before the next, so a lane's chunk c+1 DMA was issued only after its
  chunk c compute — ~1 chunk DMA in flight, full DMA latency paid per
  chunk: 3.2 ms regardless of compute restructuring. v4 advances ALL lanes
  through chunk c before any lane starts c+1 (per-lane m/l/acc/q_blk
  accumulators live in scratch), keeping `lanes` DMA chains in flight —
  the same cross-step pipelining the library kernel gets from its
  seq-tracking double buffer. Lanes overfetch to the group-max chunk count
  (clamped page-0 copies; numerically no-ops), trading bounded extra
  traffic for zero per-lane predication.
- **Static DMA discipline**: every semaphore index is static (python-level
  lane/bank/slot unroll; the buffer parity is branched under ``pl.when``),
  and every ``start`` is guarded by *exactly* the same predicate as its
  ``wait`` — issue/wait counts match by construction, the deadlock class
  v1's loop-carried dynamic semaphore indices invited cannot occur.
- **Whole-tile compute** (v3, now ALL modes share one kernel body): v2's
  per-kv-head loop issued ~190 small VPU/MXU ops per chunk ([G=2, Tc]
  matmuls and updates) whose issue overhead dominated the kernel. v3 runs
  ONE block-diagonal QK matmul ``q_blk [Hq, nslots*D] @ kv_flat^T`` and ONE
  PV matmul per chunk (the MXU redundancy of the zero blocks is ~0.1
  us/chunk — irrelevant next to op overhead, and far under the chunk's DMA
  floor), with per-row-scale dequant applied to the [Hq, Tc]
  score/probability matrices via two tiny selection matmuls. The pool rides
  flat ([P, ps, nslots*D]) so head slots are contiguous lane slices — no
  in-kernel reshapes of streamed data. The interleaved dense layout and the
  K-first rs layouts differ only in the static selector matrices (K at even
  slots vs the first Hk slots). int8→bf16 converts are exact (values <=
  127); q and p are cast to bf16 for MXU-rate matmuls even on bf16 pools —
  the accepted error vs an f32 oracle is bf16 rounding of q/p (observed
  max|Δ| ~5e-3 at B=64/ctx=512; tests gate at 1e-2).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _make_dma(kv_lens_ref, page_indices_ref, pages_hbm, scales_hbm, kbuf,
              sbuf, sems, sems_s, *, ps, chunk, lanes, with_scales):
    """issue/wait pair for one chunk of pages.

    Copies are UNCONDITIONAL (out-of-range pages clamp to page 0, like the
    library kernel's MultiPageAsyncCopyDescriptor): per-page ``pl.when``
    predication costs ~0.5 us of scalar-core time per page — measured as
    the dominant cost of the whole kernel (~3.4 ms of a 3.5 ms call at
    B=256/ctx=1k). The score-level valid mask makes clamped-page data
    harmless. One shared semaphore per (lane, bank); every started copy is
    waited exactly once per chunk — every lane (even kv_len=0) consumes at
    least one chunk, so counts balance by construction."""
    W = page_indices_ref.shape[1]

    def issue(li: int, bank: int, cc, step):
        lane = step * lanes + li
        npages = pl.cdiv(kv_lens_ref[lane], ps) - cc * chunk
        for j in range(chunk):
            idx = jnp.minimum(cc * chunk + j, W - 1)
            pid = jax.lax.select(j < npages,
                                 page_indices_ref[lane, idx], 0)
            pltpu.make_async_copy(
                pages_hbm.at[pid],
                kbuf.at[li, bank, pl.ds(j * ps, ps)],
                sems.at[li, bank]).start()
            if with_scales:
                pltpu.make_async_copy(
                    scales_hbm.at[pid],
                    sbuf.at[li, bank, pl.ds(j * ps, ps)],
                    sems_s.at[li, bank]).start()

    def wait(li: int, bank: int, cc, step):
        for j in range(chunk):
            pltpu.make_async_copy(
                pages_hbm.at[0],
                kbuf.at[li, bank, pl.ds(j * ps, ps)],
                sems.at[li, bank]).wait()
            if with_scales:
                pltpu.make_async_copy(
                    scales_hbm.at[0],
                    sbuf.at[li, bank, pl.ds(j * ps, ps)],
                    sems_s.at[li, bank]).wait()

    return issue, wait


def _kernel(
    kv_lens_ref,       # i32[B] context length per lane (0 = skip lane)
    page_indices_ref,  # i32[B, W]
    q_ref,             # [LG, Hq, D] this group's queries
    pages_hbm,         # [P, ps, RW] FLAT page pool (ANY/HBM), RW = nslots*D
    scales_hbm,        # [P, ps, SW] bf16 per-row scales K-first, or None
    o_ref,             # [LG, Hq, D]
    kbuf,              # [LG, 2, CHUNK * ps, RW] per-lane double buffers
    sbuf,              # [LG, 2, CHUNK * ps, SW] bf16, or None
    sems,              # DMA sems [LG, 2] (shared per lane/bank)
    sems_s,            # DMA sems [LG, 2] (shared per lane/bank), or None
    m_ref,             # f32[LG, Hq, 128] running max (lane-replicated cols)
    l_ref,             # f32[LG, Hq, 128] running denom
    acc_ref,           # f32[LG, Hq, D]
    qblk_ref,          # bf16[LG, Hq, nslots*D] block-diagonal q per lane
    *,
    ps: int,
    chunk: int,
    lanes: int,
    num_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    kv_scale: float | None,
    mode: str,         # dense | int8_rs | int4_rs
    interpret: bool,
    debug: str,
):
    step = pl.program_id(0)
    Tc = chunk * ps
    Hq, Hk = num_heads, num_kv_heads
    G = Hq // Hk
    D = q_ref.shape[-1]
    with_scales = mode in ("int8_rs", "int4_rs")
    packed_int4 = mode == "int4_rs"
    nslots = Hk if packed_int4 else 2 * Hk    # head slots per stored row
    issue, wait = _make_dma(kv_lens_ref, page_indices_ref, pages_hbm,
                            scales_hbm, kbuf, sbuf, sems, sems_s, ps=ps,
                            chunk=chunk, lanes=lanes,
                            with_scales=with_scales)

    # Static selectors: q row i attends kv head h = i // G. Stored layouts
    # differ only in which slot holds that head's K and V:
    #   dense    (interleaved): K at slot 2h, V at slot 2h + 1
    #   int8_rs  (K-first)    : K at slot h,  V at slot h + Hk
    #   int4_rs  (packed)     : K and V nibbles both at slot h
    qrow3 = jax.lax.broadcasted_iota(jnp.int32, (Hq, nslots, D), 0)
    slot3 = jax.lax.broadcasted_iota(jnp.int32, (Hq, nslots, D), 1)
    h3 = qrow3 // G
    if mode == "dense":
        k_slot3, v_slot3 = 2 * h3, 2 * h3 + 1
    elif mode == "int8_rs":
        k_slot3, v_slot3 = h3, h3 + Hk
    else:
        k_slot3 = v_slot3 = h3
    sel_k3 = (slot3 == k_slot3).astype(jnp.float32)       # gates q_blk
    sel_v3 = (slot3 == v_slot3).astype(jnp.float32)       # gates pv extract
    if with_scales:
        # E_k / E_v expand the [2Hk, Tc] transposed scale rows (always
        # K-first in the sidecar) to [Hq, Tc] with one tiny matmul each.
        ri = jax.lax.broadcasted_iota(jnp.int32, (Hq, 2 * Hk), 0) // G
        ci = jax.lax.broadcasted_iota(jnp.int32, (Hq, 2 * Hk), 1)
        e_k = (ci == ri).astype(jnp.float32)              # [Hq, 2Hk]
        e_v = (ci == ri + Hk).astype(jnp.float32)

    # Group-max chunk count: every lane in the group advances through the
    # SAME number of chunks (chunk-outer / lane-inner pipeline). Lanes past
    # their own kv_len overfetch clamped page-0 data — numerically a no-op
    # (every position invalid -> p zeroed, alpha = 1) — in exchange for
    # `lanes` DMA chains permanently in flight. The previous lane-outer
    # structure left only ~1 chunk DMA in flight and paid full DMA latency
    # per chunk: measured 3.2 ms vs the library kernel's 0.72 ms at
    # B=256/ctx=1k int8.
    max_nch = jnp.int32(1)
    for li in range(lanes):
        max_nch = jnp.maximum(
            max_nch, pl.cdiv(kv_lens_ref[step * lanes + li], Tc))

    if debug != "compute":
        # prefetch every lane's first chunk before any compute
        for li in range(lanes):
            issue(li, 0, 0, step)

    for li in range(lanes):
        m_ref[li] = jnp.full_like(m_ref[li], _NEG_INF)
        l_ref[li] = jnp.zeros_like(l_ref[li])
        acc_ref[li] = jnp.zeros_like(acc_ref[li])
        q = q_ref[li].astype(jnp.float32) * sm_scale      # [Hq, D]
        if kv_scale is not None:
            q = q * kv_scale                  # K dequant rides in with q
        qblk_ref[li] = ((q[:, None, :] * sel_k3).reshape(Hq, nslots * D)
                        .astype(jnp.bfloat16))            # [Hq, nslots*D]

    def body(c, _):
        parity = jax.lax.rem(c, 2)

        def consume_lane(bank: int, li: int, c=c):
            lane = step * lanes + li
            if debug != "compute":
                wait(li, bank, c, step)

                @pl.when(c + 1 < max_nch)
                def _():
                    issue(li, 1 - bank, c + 1, step)
            if debug == "dma":
                # touch the buffers so the copies stay live
                acc_ref[li] += kbuf[li, bank][:Hq, :D].astype(jnp.float32)
                if with_scales:
                    acc_ref[li] += sbuf[li, bank][:Hq, :D].astype(jnp.float32)
                return

            kv = kbuf[li, bank]                  # [Tc, RW]
            pos = c * Tc + jax.lax.broadcasted_iota(jnp.int32, (1, Tc), 1)
            valid = pos < kv_lens_ref[lane]      # [1, Tc]
            if interpret:
                # interpret-mode scratch is NaN-initialized; rows past
                # kv_len were never DMA'd and would poison p @ v via
                # 0 * NaN. On hardware stale VMEM rows are finite and
                # the masked softmax zeroes their weights.
                pcol = c * Tc + jax.lax.broadcasted_iota(
                    jnp.int32, kv.shape, 0)
                kv = jnp.where(pcol < kv_lens_ref[lane], kv,
                               jnp.zeros_like(kv))
            q_blk = qblk_ref[li]
            if with_scales:
                sc = sbuf[li, bank][:, :2 * Hk]  # [Tc, 2Hk] bf16 K-first
                sc_t = jax.lax.transpose(sc.astype(jnp.float32), (1, 0))
                if interpret:
                    sc_t = jnp.where(valid, sc_t, 0.0)
                sck = jax.lax.dot_general(        # [Hq, Tc] K row scales
                    e_k, sc_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scv = jax.lax.dot_general(        # [Hq, Tc] V row scales
                    e_v, sc_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if packed_int4:
                bf = kv.astype(jnp.float32)       # b = 16V + K, exact
                vb = jnp.floor((bf + 8.0) * 0.0625).astype(jnp.bfloat16)
                bb = bf.astype(jnp.bfloat16)      # |b| <= 119: exact
                s_b = jax.lax.dot_general(
                    q_blk, bb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [Hq, Tc]
                s_v = jax.lax.dot_general(
                    q_blk, vb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = (s_b - 16.0 * s_v) * sck      # q·K, dequantized
                pv_src = vb                       # [Tc, Hk*D]
            else:
                kvb = (kv if kv.dtype == jnp.bfloat16
                       else kv.astype(jnp.bfloat16))
                # q_blk is zero at V slots, so one whole-row matmul
                # yields q·K directly (the V lanes contribute nothing)
                s = jax.lax.dot_general(
                    q_blk, kvb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [Hq, Tc]
                if with_scales:
                    s = s * sck
                pv_src = kvb                      # [Tc, nslots*D]
            s = jnp.where(valid, s, _NEG_INF)     # [Hq, Tc]
            m_old = m_ref[li]
            s_max = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_old, jnp.broadcast_to(s_max, m_old.shape))
            alpha = jnp.exp(m_old - m_new)
            # explicit zero for invalid positions: when every position
            # so far is invalid (kv_len=0 lanes, overfetched chunks),
            # s == m_new == -inf and exp(s - m_new) = 1 would accumulate
            # clamped page-0 data with l = Tc instead of staying 0.
            p = jnp.where(valid, jnp.exp(s - m_new[:, :1]), 0.0)
            l_ref[li] = l_ref[li] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), alpha.shape)
            # V row-scale dequant rides on p (it varies along Tc, so it
            # must multiply before the contraction)
            pbf = ((p * scv) if with_scales else p).astype(jnp.bfloat16)
            pv_all = jax.lax.dot_general(
                pbf, pv_src, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Hq, nslots'*D]
            ns = pv_all.shape[1] // D
            pv = jnp.sum(pv_all.reshape(Hq, ns, D) * sel_v3[:, :ns],
                         axis=1)
            if kv_scale is not None:
                pv = pv * kv_scale   # V dequant (K's rode in with q)
            acc_ref[li] = acc_ref[li] * alpha + pv
            m_ref[li] = m_new

        @pl.when(parity == 0)
        def _():
            for li in range(lanes):
                consume_lane(0, li)

        @pl.when(parity == 1)
        def _():
            for li in range(lanes):
                consume_lane(1, li)

        return 0

    jax.lax.fori_loop(0, max_nch, body, 0)
    for li in range(lanes):
        o_ref[li] = (acc_ref[li]
                     / jnp.maximum(l_ref[li], 1e-30)).astype(o_ref.dtype)


def _kernel_dense_entry(kv_lens_ref, page_indices_ref, q_ref, pages_hbm,
                        o_ref, kbuf, sems, m_ref, l_ref, acc_ref, qblk_ref,
                        **kw):
    """Signature adapter: the dense pool has no scale sidecar operands."""
    _kernel(kv_lens_ref, page_indices_ref, q_ref, pages_hbm, None, o_ref,
            kbuf, None, sems, None, m_ref, l_ref, acc_ref, qblk_ref, **kw)


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_scale", "kv_mode",
                                             "chunk", "lanes_per_step",
                                             "interpret", "debug"))
def flash_decode_attention(q, kv_pages, kv_lens, page_indices, *,
                           sm_scale: float, kv_scale: float | None = None,
                           kv_scales=None, kv_mode: str = "dense",
                           chunk: int = 4, lanes_per_step: int = 8,
                           interpret: bool = False, debug: str = "full"):
    """q [B, Hq, D] (one token per lane) against paged KV.

    kv_pages: [P, ps, 2Hk, D] interleaved (dense), or K-first [P, ps, 2Hk, D]
    (int8_rs) / packed b=16V+K [P, ps, Hk, D] (int4_rs) — see
    ops.attention.quantize_kv. kv_lens i32[B] with 0 marking inactive lanes;
    page_indices i32[B, W]; kv_scales [P, ps, SW] bf16 lane-padded K-first
    scales (ops.attention.kv_scale_width) for the _rs modes. Returns
    [B, Hq, D] in q's dtype. B must be a multiple of lanes_per_step (engine
    batch buckets are powers of two).
    """
    from nanovllm_tpu.ops.attention import kv_scale_width
    B, Hq, D = q.shape
    P, ps, hdim, Dp = kv_pages.shape
    rs = kv_mode in ("int8_rs", "int4_rs")
    Hk = hdim if kv_mode == "int4_rs" else hdim // 2
    assert D == 128, f"flash_decode_attention requires head_dim 128, got {D}"
    assert kv_mode in ("dense", "int8_rs", "int4_rs"), kv_mode
    assert Dp == D, (kv_mode, Dp)
    lanes = min(lanes_per_step, B)
    assert B % lanes == 0, (B, lanes)
    SW = kv_scale_width(2 * Hk)
    out_shape = jax.ShapeDtypeStruct((B, Hq, D), q.dtype)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        # lanes x double-buffered chunk KV scratch exceeds the 16 MB default
        # scoped-vmem limit; v5e has 128 MB VMEM, raise like the library
        # ragged kernel does.
        vmem_limit_bytes=100 * 2**20)
    RW = hdim * D
    pages_flat = kv_pages.reshape(P, ps, RW)  # layout-preserving
    kw = dict(ps=ps, chunk=chunk, lanes=lanes, num_heads=Hq,
              num_kv_heads=Hk, sm_scale=sm_scale, kv_scale=kv_scale,
              mode=kv_mode, interpret=interpret, debug=debug)

    if not rs:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // lanes,),
            in_specs=[
                pl.BlockSpec((lanes, Hq, D), lambda s, *_: (s, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((lanes, Hq, D), lambda s, *_: (s, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((lanes, 2, chunk * ps, RW), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((lanes, 2)),
                pltpu.VMEM((lanes, Hq, 128), jnp.float32),
                pltpu.VMEM((lanes, Hq, 128), jnp.float32),
                pltpu.VMEM((lanes, Hq, D), jnp.float32),
                pltpu.VMEM((lanes, Hq, RW), jnp.bfloat16),  # q_blk
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_dense_entry, **kw),
            grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(kv_lens, page_indices, q, pages_flat)

    assert kv_scale is None, "rs modes carry per-row scales, not a global one"
    assert kv_scales is not None and kv_scales.shape == (P, ps, SW), \
        (None if kv_scales is None else kv_scales.shape, (P, ps, SW))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // lanes,),
        in_specs=[
            pl.BlockSpec((lanes, Hq, D), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((lanes, Hq, D), lambda s, *_: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((lanes, 2, chunk * ps, RW), kv_pages.dtype),
            pltpu.VMEM((lanes, 2, chunk * ps, SW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((lanes, 2)),
            pltpu.SemaphoreType.DMA((lanes, 2)),
            pltpu.VMEM((lanes, Hq, 128), jnp.float32),
            pltpu.VMEM((lanes, Hq, 128), jnp.float32),
            pltpu.VMEM((lanes, Hq, D), jnp.float32),
            pltpu.VMEM((lanes, Hq, RW), jnp.bfloat16),  # q_blk
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, **kw),
        grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=cparams, interpret=interpret,
    )(kv_lens, page_indices, q, pages_flat, kv_scales)
