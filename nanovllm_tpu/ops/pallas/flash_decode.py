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

- ``dense``    — pool [P, ps, 2Hk, D] in bf16 / int8 / fp8 with an optional
                 global ``kv_scale`` (the layout the library kernel reads).
- ``int8_rs``  — int8 pool + per-(row, head) bf16 scales in a sidecar
                 ``kv_scales [P, ps, 2Hk]``: dequant is a [Tc, 1] column
                 broadcast against each head's [Tc, D] tile. Fixes the
                 global-scale clipping hazard on unnormalized V rows.
- ``int4_rs``  — nibble-packed int8 pool [P, ps, 2Hk, D/2] (low nibble =
                 D[0:64], high = D[64:128], so in-kernel unpack is two
                 arithmetic shifts + a lane concat, no interleave) + the
                 same per-row scales. Halves decode HBM traffic vs int8.

Design lessons from the v1 post-mortems (an earlier revision measured
3.1 ms vs the tuned library kernel's 0.86 ms at B=256/ctx=1k int8, and a
restructured one deadlocked on device):

- **Lane grouping**: grid is (B / lanes_per_step,), not (B,) — v1's 256
  sequential grid steps paid ~12 us of per-step overhead each, which
  dominated the whole kernel. Lanes in a group are processed sequentially
  in-register while their page streams prefetch concurrently.
- **Static DMA discipline**: every semaphore index is static (python-level
  lane/bank/slot unroll; the buffer parity is branched under ``pl.when``),
  and every ``start`` is guarded by *exactly* the same predicate as its
  ``wait`` — issue/wait counts match by construction, the deadlock class
  v1's loop-carried dynamic semaphore indices invited cannot occur.
- **No cross-step handoff**: v1 threaded a prefetch handoff through SMEM
  across grid steps; the bubble it hides is one DMA latency per grid step
  (not per lane), which lane grouping already divides by lanes_per_step.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _unpack_int4(packed):
    """[T, Dp] int8 nibbles → [T, 2*Dp] int8 in original D order
    (low nibble = first half of D, high nibble = second half)."""
    lo = jnp.left_shift(packed, 4) >> 4   # arithmetic: sign-extended low
    hi = packed >> 4                       # arithmetic: sign-extended high
    return jnp.concatenate([lo, hi], axis=-1)


def _kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B] context length per lane (0 = skip lane)
    page_indices_ref,  # i32[B, W]
    # inputs
    q_ref,             # [LG, Hq, D] this group's queries
    pages_hbm,         # [P, ps, 2Hk, Dp] page pool (ANY/HBM)
    scales_hbm,        # [P, ps, 2Hk] bf16 per-row scales (ANY; dummy if unused)
    # output
    o_ref,             # [LG, Hq, D]
    # scratch
    kbuf,              # [LG, 2, CHUNK * ps, 2Hk, Dp] per-lane double buffers
    sbuf,              # [LG, 2, CHUNK * ps, 2Hk] bf16 scale buffers
    sems,              # DMA sems [LG, 2, CHUNK]
    sems_s,            # DMA sems [LG, 2, CHUNK] (scale copies)
    m_ref,             # f32[Hq, 128] running max (lane-replicated)
    l_ref,             # f32[Hq, 128] running denom
    acc_ref,           # f32[Hq, D]
    *,
    ps: int,
    chunk: int,
    lanes: int,
    num_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    kv_scale: float | None,
    kv_mode: str,
    interpret: bool,
):
    step = pl.program_id(0)
    Tc = chunk * ps
    G = num_heads // num_kv_heads
    rs = kv_mode in ("int8_rs", "int4_rs")

    def issue(li: int, bank: int, cc):
        """Start the page (+scale) DMAs of lane li's chunk cc into bank."""
        lane = step * lanes + li
        npages = jnp.clip(pl.cdiv(kv_lens_ref[lane], ps) - cc * chunk, 0, chunk)
        for j in range(chunk):
            @pl.when(j < npages)
            def _():
                pid = page_indices_ref[lane, cc * chunk + j]
                pltpu.make_async_copy(
                    pages_hbm.at[pid],
                    kbuf.at[li, bank, pl.ds(j * ps, ps)],
                    sems.at[li, bank, j]).start()
                if rs:
                    pltpu.make_async_copy(
                        scales_hbm.at[pid],
                        sbuf.at[li, bank, pl.ds(j * ps, ps)],
                        sems_s.at[li, bank, j]).start()

    def wait(li: int, bank: int, cc):
        """Wait the DMAs issued by ``issue(li, bank, cc)`` — same predicate,
        same static indices, so start/wait counts always match."""
        lane = step * lanes + li
        npages = jnp.clip(pl.cdiv(kv_lens_ref[lane], ps) - cc * chunk, 0, chunk)
        for j in range(chunk):
            @pl.when(j < npages)
            def _():
                pltpu.make_async_copy(
                    pages_hbm.at[0],
                    kbuf.at[li, bank, pl.ds(j * ps, ps)],
                    sems.at[li, bank, j]).wait()
                if rs:
                    pltpu.make_async_copy(
                        scales_hbm.at[0],
                        sbuf.at[li, bank, pl.ds(j * ps, ps)],
                        sems_s.at[li, bank, j]).wait()

    # prefetch every lane's first chunk before any compute
    for li in range(lanes):
        issue(li, 0, 0)

    for li in range(lanes):                      # lanes compute sequentially
        lane = step * lanes + li
        nch = pl.cdiv(kv_lens_ref[lane], Tc)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[li].astype(jnp.float32) * sm_scale      # [Hq, D]
        if kv_scale is not None:
            q = q * kv_scale

        def body(c, _, li=li, lane=lane, nch=nch, q=q):
            parity = jax.lax.rem(c, 2)

            def consume(bank: int, c=c, li=li, lane=lane, nch=nch, q=q):
                wait(li, bank, c)

                @pl.when(c + 1 < nch)
                def _():
                    issue(li, 1 - bank, c + 1)

                kv = kbuf[li, bank]                  # [Tc, 2Hk, Dp]
                pos = c * Tc + jax.lax.broadcasted_iota(jnp.int32, (1, Tc), 1)
                valid = pos < kv_lens_ref[lane]      # [1, Tc]
                if interpret:
                    # interpret-mode scratch is NaN-initialized; rows past
                    # kv_len were never DMA'd and would poison p @ v via
                    # 0 * NaN. On hardware stale VMEM rows are finite and
                    # the masked softmax zeroes their weights.
                    Dp = kv.shape[-1]
                    pcol = c * Tc + jax.lax.broadcasted_iota(
                        jnp.int32, (Tc, Dp), 0)
                    kv = jnp.where((pcol < kv_lens_ref[lane])[:, None, :]
                                   .repeat(kv.shape[1], 1), kv,
                                   jnp.zeros_like(kv))
                for h in range(num_kv_heads):
                    k = kv[:, 2 * h, :]
                    v = kv[:, 2 * h + 1, :]
                    if kv_mode == "int4_rs":
                        k = _unpack_int4(k)          # [Tc, D]
                        v = _unpack_int4(v)
                    k = k.astype(jnp.float32)
                    v = v.astype(jnp.float32)
                    if rs:
                        sc_chunk = sbuf[li, bank]    # [Tc, 2Hk] bf16
                        k = k * sc_chunk[:, 2 * h:2 * h + 1].astype(jnp.float32)
                        v = v * sc_chunk[:, 2 * h + 1:2 * h + 2].astype(jnp.float32)
                        if interpret:  # scale scratch is NaN-poisoned too
                            k = jnp.where(valid[0][:, None], k, 0.0)
                            v = jnp.where(valid[0][:, None], v, 0.0)
                    qh = q[h * G:(h + 1) * G]        # [G, D]
                    s = jax.lax.dot_general(
                        qh, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [G, Tc]
                    s = jnp.where(valid, s, _NEG_INF)
                    r = slice(h * G, (h + 1) * G)
                    m_old = m_ref[r]                 # [G, 128] lane-replicated
                    s_max = jnp.max(s, axis=1, keepdims=True)
                    m_new = jnp.maximum(m_old, jnp.broadcast_to(s_max, m_old.shape))
                    alpha = jnp.exp(m_old - m_new)
                    p = jnp.exp(s - m_new[:, :1])    # [G, Tc]
                    l_ref[r] = l_ref[r] * alpha + jnp.broadcast_to(
                        jnp.sum(p, axis=1, keepdims=True), alpha.shape)
                    pv = jax.lax.dot_general(
                        p, v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [G, D]
                    if kv_scale is not None:
                        pv = pv * kv_scale   # V dequant (K's rode in with q)
                    acc_ref[r] = acc_ref[r] * alpha + pv
                    m_ref[r] = m_new

            @pl.when(parity == 0)
            def _():
                consume(0)

            @pl.when(parity == 1)
            def _():
                consume(1)

            return 0

        jax.lax.fori_loop(0, nch, body, 0)
        o_ref[li] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_scale", "kv_mode",
                                             "chunk", "lanes_per_step",
                                             "interpret"))
def flash_decode_attention(q, kv_pages, kv_lens, page_indices, *,
                           sm_scale: float, kv_scale: float | None = None,
                           kv_scales=None, kv_mode: str = "dense",
                           chunk: int = 4, lanes_per_step: int = 8,
                           interpret: bool = False):
    """q [B, Hq, D] (one token per lane) against paged KV.

    kv_pages [P, ps, 2Hk, Dp] (K even / V odd combined heads; Dp = D/2 for
    int4_rs); kv_lens i32[B] with 0 marking inactive lanes; page_indices
    i32[B, W]; kv_scales [P, ps, 2Hk] bf16 for the _rs modes. Returns
    [B, Hq, D] in q's dtype. B must be a multiple of lanes_per_step (engine
    batch buckets are powers of two).
    """
    B, Hq, D = q.shape
    P, ps, Hk2, Dp = kv_pages.shape
    Hk = Hk2 // 2
    assert D == 128, f"flash_decode_attention requires head_dim 128, got {D}"
    assert kv_mode in ("dense", "int8_rs", "int4_rs"), kv_mode
    assert Dp == (D // 2 if kv_mode == "int4_rs" else D), (kv_mode, Dp)
    lanes = min(lanes_per_step, B)
    assert B % lanes == 0, (B, lanes)
    if kv_mode == "dense":
        # dummy scale pool: the DMA descriptors for it are never started
        kv_scales = jnp.zeros((1, ps, Hk2), jnp.bfloat16)
    else:
        assert kv_scales is not None and kv_scales.shape == (P, ps, Hk2)

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
            pltpu.VMEM((lanes, 2, chunk * ps, Hk2, Dp), kv_pages.dtype),
            pltpu.VMEM((lanes, 2, chunk * ps, Hk2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((lanes, 2, chunk)),
            pltpu.SemaphoreType.DMA((lanes, 2, chunk)),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, ps=ps, chunk=chunk, lanes=lanes,
                          num_heads=Hq, num_kv_heads=Hk, sm_scale=sm_scale,
                          kv_scale=kv_scale, kv_mode=kv_mode,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(kv_lens, page_indices, q, kv_pages, kv_scales)
