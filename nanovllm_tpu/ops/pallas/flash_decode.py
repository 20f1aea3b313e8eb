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
- ``int8_rs``  — int8 pool + per-(row, head) f32 scales in a sidecar
                 ``kv_scales [P, ps, SW]`` (SW = 128-lane-padded width:
                 Mosaic's DMA slicer requires 128-lane-minor blocks).
                 Fixes the global-scale clipping hazard on unnormalized
                 V rows. Pool head axis is **K-first** ([0:Hk] = K heads,
                 [Hk:] = V).
- ``int4_rs``  — packed pool [P, ps, Hk, D]: byte b = 16*V + K
                 (K, V in [-7, 7]) + the same per-row scales. Halves
                 decode HBM traffic vs int8; K/V are unpacked per head
                 tile in-kernel with two integer VPU ops (overlapped with
                 the MXU).

Hardware-measured design lessons, v1-v4 (B=256/ctx=1k int8; tuned library
kernel = 0.72-1.0 ms):

- **Lane grouping** (v2): grid is (B / lanes_per_step,), not (B,) — v1's
  256 sequential grid steps paid ~12 us of per-step overhead each (3.1 ms).
- **Chunk-outer pipelining** (v4): advance ALL lanes through chunk c before
  any lane starts c+1 (per-lane m/l/acc accumulators in scratch) so `lanes`
  DMA chains stay in flight; lanes overfetch to the group-max chunk count
  (clamped page-0 copies are numeric no-ops) instead of per-lane
  predication.
- **No relayouts on the stream** (v5): v3/v4 flattened the pool to
  [P, ps, hdim*D] per call — on TPU that last-two-dim collapse is a REAL
  relayout copy of the whole pool (~1.3 ms for 550 MB), invisible in the
  kernel but billed to every dispatch. v5 DMAs whole 4D page boxes
  [ps, hdim, D] into a [.., chunk, ps, hdim, D] scratch; every compute
  slice collapses only LEADING dims (layout-preserving).
- **Tile-minimal matmuls** (v5): the v3 whole-row block-diagonal matmul
  ([Hq, nslots*D] @ row^T) executes nslots x the useful MXU tiles (K-dim
  redundancy): ~2.7 ms of compute alone. Per-kv-head matmuls [G, D] @
  [D, Tc] / [G, Tc] @ [Tc, D] are tile-minimal (M <= 128 rides in one
  MXU pass; K = D = 128 exactly one tile): Hq/Hk_tiles x 2 x Tc/128 tiles
  per chunk — the same shape economics as the library kernel. Op-issue
  overhead (the v2 failure mode) is amortized by large chunks (default
  Tc = 16 pages = 1024 rows per consume).
- Per-row scales ride the score/probability matrices: sc_t [2Hk, Tc] is
  transposed once per chunk and expanded to [Hq, Tc] by two tiny selection
  matmuls; per-head row slices of the result are free.

Round-3 hardware verdict (tools/flash_decode_validate.py, v5e, in-run
ratios): DMA-only = 0.60 ms at B=256/ctx=1k int8 — AT the ~0.64 ms HBM
floor — but compute-only = 3.96 ms vs the ~0.56 ms M=16 MXU bound, so v5
runs 2.1x the tuned library kernel on dense int8 and 10-24x on the rs
modes (scale transpose + selection matmuls + per-page sidecar DMAs).
The library kernel itself measures ~88% of HBM peak at this shape, i.e.
speed-of-light for int8 pages; dense decode therefore ships on the
library kernel and this kernel serves the rs pools (correctness-complete,
hardware-verified) until the v6 compute rewrite lands:

- v6 design (op-count /8): fuse the per-kv-head matmuls into all-pairs
  [Hq, D] @ [D, Tc*Hk] with h-minor flat columns (leading-dim collapse of
  the [chunk, ps, Hk, D] box, layout-free), group-mask via lane-iota
  (col % Hk == row // G); per-chunk op count drops from ~16 matmuls +
  ~40 VPU ops to 2 matmuls + ~10 VPU ops at identical MXU occupancy
  (M <= 128 rides one pass either way).
- v6 scales: store K/V scale sidecars as flat 128-lane tables in (t, h)
  h-minor page blocks ([P, 4, 128] f32 each for Hk=8/ps=64) so the
  per-chunk scale factors are VMEM gathers whose element order MATCHES
  the all-pairs score columns — the [Tc, 2Hk] transpose relayout, the
  selection matmuls, and the per-page sidecar DMA descriptors all
  disappear, and the sidecar shrinks 8x (with today's padded f32 sidecar
  int4 capacity is ~1.33x int8; the flat table raises it to ~1.88x).

Numerics: q and p are cast to bf16 before the MXU matmuls in every mode
(int8/int4 K/V cast to bf16 exactly; softmax statistics and the output
accumulator stay f32). The bf16 q/p rounding bounds the error vs an f32
oracle at ~1e-2 absolute on O(1)-normalized outputs (observed 2.4e-4..4e-3
vs the library kernel at bench shapes; tests/test_flash_decode.py gates at
1e-2). The f32-q path would halve MXU throughput on the bandwidth-critical
decode path for accuracy the f32 accumulator already provides.
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
    predication costs ~0.5 us of scalar-core time per page. The score-level
    valid mask makes clamped-page data harmless. Every copy moves one FULL
    page box (pages_hbm[pid] -> kbuf[li, bank*chunk + j]) — whole-box
    destinations keep each transfer a single contiguous descriptor. One
    shared semaphore per (lane, bank); every started copy is waited exactly
    once per chunk — every lane consumes the group-max chunk count, so
    counts balance by construction."""
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
                kbuf.at[li, bank * chunk + j],
                sems.at[li, bank]).start()
            if with_scales:
                pltpu.make_async_copy(
                    scales_hbm.at[pid],
                    sbuf.at[li, bank * chunk + j],
                    sems_s.at[li, bank]).start()

    def wait(li: int, bank: int, cc, step):
        for j in range(chunk):
            pltpu.make_async_copy(
                pages_hbm.at[0],
                kbuf.at[li, bank * chunk + j],
                sems.at[li, bank]).wait()
            if with_scales:
                pltpu.make_async_copy(
                    scales_hbm.at[0],
                    sbuf.at[li, bank * chunk + j],
                    sems_s.at[li, bank]).wait()

    return issue, wait


def _kernel(
    kv_lens_ref,       # i32[B] context length per lane (0 = skip lane)
    page_indices_ref,  # i32[B, W]
    q_ref,             # [LG, Hq, D] this group's queries
    pages_hbm,         # [P, ps, hdim, D] page pool (ANY/HBM)
    scales_hbm,        # [P, ps, SW] f32 per-row scales K-first, or None
    o_ref,             # [LG, Hq, D]
    kbuf,              # [LG, 2*CHUNK, ps, hdim, D] per-lane double buffers
    sbuf,              # [LG, 2*CHUNK, ps, SW] f32, or None
    sems,              # DMA sems [LG, 2] (shared per lane/bank)
    sems_s,            # DMA sems [LG, 2] (shared per lane/bank), or None
    m_ref,             # f32[LG, Hq, 128] running max (lane-replicated cols)
    l_ref,             # f32[LG, Hq, 128] running denom
    acc_ref,           # f32[LG, Hq, D]
    qs_ref,            # i8/bf16[LG, Hq, D] pre-scaled (row-quantized) queries
    qsc_ref,           # f32[LG, Hq, 128] per-row q dequant scales (int8 MXU)
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
    # int8x8 MXU path: quantized q . K and p . V on the 394-TOPS int8 pipe
    # (2x the bf16 tile rate) whenever the page values are already int8.
    use_int8 = kbuf.dtype == jnp.int8
    issue, wait = _make_dma(kv_lens_ref, page_indices_ref, pages_hbm,
                            scales_hbm, kbuf, sbuf, sems, sems_s, ps=ps,
                            chunk=chunk, lanes=lanes,
                            with_scales=with_scales)

    # v6 all-pairs geometry: each chunk's pages collapse (leading dims only,
    # layout-free) to a row matrix [N, D] in (page, pos, slot) order; scores
    # and PV are ONE matmul each over all N columns, with the GQA head
    # matching expressed as a column mask instead of per-head slicing.
    hdim = Hk if packed_int4 else 2 * Hk     # pool head-slot count
    N = Tc * hdim
    col_slot = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % hdim
    col_t = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) // hdim  # local pos
    row_group = jax.lax.broadcasted_iota(jnp.int32, (Hq, 1), 0) // G
    if mode == "dense":
        k_col = col_slot == 2 * row_group    # interleaved: K even, V odd
        roll_shift = 1                       # K col -> matching V col
    else:
        k_col = col_slot == row_group        # K-first / packed
        roll_shift = 0 if packed_int4 else Hk

    # Group-max chunk count: every lane advances through the same number of
    # chunks (chunk-outer / lane-inner pipeline, v4) so `lanes` DMA chains
    # stay in flight; lanes past their kv_len overfetch clamped page-0 data
    # (numeric no-ops: every position invalid -> p zeroed, alpha = 1).
    max_nch = jnp.int32(1)
    for li in range(lanes):
        max_nch = jnp.maximum(
            max_nch, pl.cdiv(kv_lens_ref[step * lanes + li], Tc))

    if debug != "compute":
        for li in range(lanes):
            issue(li, 0, 0, step)

    for li in range(lanes):
        m_ref[li] = jnp.full_like(m_ref[li], _NEG_INF)
        l_ref[li] = jnp.zeros_like(l_ref[li])
        acc_ref[li] = jnp.zeros_like(acc_ref[li])
        q = q_ref[li].astype(jnp.float32) * sm_scale      # [Hq, D]
        if kv_scale is not None:
            q = q * kv_scale                  # K dequant rides in with q
        if use_int8:
            # dynamic per-row symmetric quant; the dequant scale multiplies
            # the int32 scores (q error ~0.4% relative, far under the page
            # quantization noise it rides on)
            qmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                               1e-8)
            qs_ref[li] = jnp.round(q * (127.0 / qmax)).astype(jnp.int8)
            qsc_ref[li] = jnp.broadcast_to(qmax * (1.0 / 127.0),
                                           qsc_ref[li].shape)
        else:
            qs_ref[li] = q.astype(jnp.bfloat16)

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
                acc_ref[li] += kbuf[li, bank * chunk, :Hq, 0, :D].astype(
                    jnp.float32)
                if with_scales:
                    acc_ref[li] += sbuf[li, bank * chunk, :Hq, :D].astype(
                        jnp.float32)
                return

            rows = kbuf[li, pl.ds(bank * chunk, chunk)].reshape(N, D)
            if interpret and not use_int8:
                # interpret-mode scratch is NaN-initialized; rows past
                # kv_len were never DMA'd and would poison p @ v via
                # 0 * NaN. On hardware stale VMEM rows are finite (and the
                # int8 path cannot produce NaN at all); the masked softmax
                # zeroes their weights either way.
                rpos = c * Tc + jax.lax.broadcasted_iota(
                    jnp.int32, (N, 1), 0) // hdim
                rows = jnp.where(rpos < kv_lens_ref[lane], rows,
                                 jnp.zeros_like(rows))
            if packed_int4:
                b32 = rows.astype(jnp.int32)
                v32 = (b32 + 8) >> 4              # V nibble
                k32 = b32 - (v32 << 4)            # K nibble
                if use_int8:
                    k_rows, v_rows = k32.astype(jnp.int8), v32.astype(jnp.int8)
                else:
                    k_rows, v_rows = (k32.astype(jnp.bfloat16),
                                      v32.astype(jnp.bfloat16))
            elif use_int8:
                k_rows = v_rows = rows            # K/V selected by masks
            else:
                k_rows = v_rows = rows.astype(jnp.bfloat16)

            valid = ((c * Tc + col_t) < kv_lens_ref[lane]) & k_col  # [Hq, N]

            # -------- scores: ONE all-pairs matmul [Hq, D] x [N, D]^T
            if use_int8:
                s = jax.lax.dot_general(
                    qs_ref[li], k_rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                s = s * qsc_ref[li, :, :1]
            else:
                s = jax.lax.dot_general(
                    qs_ref[li], k_rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if with_scales:
                # flat per-column row scales, element order matching the
                # (pos, slot) collapse. int4: separate K/V nibble scale
                # vectors; int8_rs: ONE K-first vector serves the K columns
                # directly and the V columns after the p roll below.
                sc = (sbuf[li, pl.ds(bank * chunk, chunk), :, :2 * Hk]
                      .reshape(Tc, 2 * Hk))        # f32 K-first
                if packed_int4:
                    sck = sc[:, :Hk].reshape(1, N)
                    scv = sc[:, Hk:].reshape(1, N)
                else:
                    sck = scv = sc.reshape(1, N)
                s = s * sck
            s = jnp.where(valid, s, _NEG_INF)

            # -------- online softmax over all columns (masked cols -> 0)
            m_old = m_ref[li]                     # [Hq, 128]
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

            # -------- PV: align p with the V columns, fold in V row scales
            if with_scales and packed_int4:
                p = p * scv          # V dequant rides on p (varies per col)
            if roll_shift:
                # weight at K column (t, k_slot) moves to the matching V
                # column; masked zeros rotate into the K columns, so the
                # all-rows contraction only touches V rows.
                p = pltpu.roll(p, roll_shift, 1)
                if with_scales:      # int8_rs: scales are V's at V columns
                    p = p * scv
            if use_int8:
                pmax = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-30)
                pq = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
                pv = jax.lax.dot_general(
                    pq, v_rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                pv = pv * (pmax * (1.0 / 127.0))
            else:
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v_rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if kv_scale is not None:
                pv = pv * kv_scale   # V dequant (K's rode in with q)
            acc_ref[li] = acc_ref[li] * alpha[:, :D] + pv
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
                     / jnp.maximum(l_ref[li, :, :D], 1e-30)).astype(o_ref.dtype)


def _kernel_dense_entry(kv_lens_ref, page_indices_ref, q_ref, pages_hbm,
                        o_ref, kbuf, sems, m_ref, l_ref, acc_ref, qs_ref,
                        qsc_ref, **kw):
    """Signature adapter: the dense pool has no scale sidecar operands."""
    _kernel(kv_lens_ref, page_indices_ref, q_ref, pages_hbm, None, o_ref,
            kbuf, None, sems, None, m_ref, l_ref, acc_ref, qs_ref, qsc_ref,
            **kw)


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_scale", "kv_mode",
                                             "chunk", "lanes_per_step",
                                             "interpret", "debug"))
def flash_decode_attention(q, kv_pages, kv_lens, page_indices, *,
                           sm_scale: float, kv_scale: float | None = None,
                           kv_scales=None, kv_mode: str = "dense",
                           chunk: int = 16, lanes_per_step: int = 4,
                           interpret: bool = False, debug: str = "full"):
    """q [B, Hq, D] (one token per lane) against paged KV.

    kv_pages: [P, ps, 2Hk, D] interleaved (dense), or K-first [P, ps, 2Hk, D]
    (int8_rs) / packed b=16V+K [P, ps, Hk, D] (int4_rs) — see
    ops.attention.quantize_kv. kv_lens i32[B] with 0 marking inactive lanes;
    page_indices i32[B, W]; kv_scales [P, ps, SW] f32 lane-padded K-first
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
    kw = dict(ps=ps, chunk=chunk, lanes=lanes, num_heads=Hq,
              num_kv_heads=Hk, sm_scale=sm_scale, kv_scale=kv_scale,
              mode=kv_mode, interpret=interpret, debug=debug)
    use_int8 = kv_pages.dtype == jnp.int8
    common_scratch = [
        pltpu.VMEM((lanes, Hq, 128), jnp.float32),   # m
        pltpu.VMEM((lanes, Hq, 128), jnp.float32),   # l
        pltpu.VMEM((lanes, Hq, D), jnp.float32),     # acc
        # pre-scaled queries: row-quantized int8 on the int8-MXU path
        pltpu.VMEM((lanes, Hq, D),
                   jnp.int8 if use_int8 else jnp.bfloat16),
        pltpu.VMEM((lanes, Hq, 128), jnp.float32),   # q row dequant scales
    ]

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
                pltpu.VMEM((lanes, 2 * chunk, ps, hdim, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((lanes, 2)),
                *common_scratch,
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_dense_entry, **kw),
            grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(kv_lens, page_indices, q, kv_pages)

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
            pltpu.VMEM((lanes, 2 * chunk, ps, hdim, D), kv_pages.dtype),
            pltpu.VMEM((lanes, 2 * chunk, ps, SW), kv_scales.dtype),
            pltpu.SemaphoreType.DMA((lanes, 2)),
            pltpu.SemaphoreType.DMA((lanes, 2)),
            *common_scratch,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, **kw),
        grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=cparams, interpret=interpret,
    )(kv_lens, page_indices, q, kv_pages, kv_scales)
