"""Decode-specialized paged flash attention (one new token per sequence).

STATUS: EXPERIMENTAL — numerically verified (interpret mode, and an earlier
hardware revision was bit-exact vs the in-tree ragged kernel), but NOT wired
into the engine. The earlier revision measured 3.1 ms vs the tuned library
kernel's 0.86 ms at B=256/ctx=1k int8 (grid-step overhead dominated), and a
restructured version deadlocked on device (suspect: dynamic semaphore-array
indexing by a loop-carried buffer id — now replaced by static banks under
pl.when, unvalidated on hardware since a hung TPU program wedges the chip
for every later client). The engine ships the tuned in-tree kernel; this
file is the groundwork for sub-byte KV decode (in-kernel nibble unpack),
which is the next material decode win (see REPORT.md §6).

The general in-tree ragged-paged-attention kernel carries machinery this
path never uses (ragged q streams, per-seq q-block loops, mixed
prefill+decode). This kernel is the decode fast path the engine's
``lax.scan`` steps call: q is exactly [B, Hq, D] (one token per lane),
every sequence reads its own pages, and the whole kernel is a DMA pipeline
that streams KV pages through VMEM at HBM bandwidth with an online-softmax
accumulator riding in scratch. It is also the integration point for
sub-byte KV layouts: the page pool is a plain jit argument whose dtype the
kernel dequantizes in-VMEM (int8/fp8 via ``kv_scale``; sub-byte packings
can be added with in-kernel bitcasts, which a tunneled PJRT client cannot
do at the jit boundary — see tools/int4_probe.py).

Reference counterpart: flash_attn_with_kvcache (reference:
nanovllm/layers/attention.py:72-74), an external CUDA dependency there.

Structure: grid (B,) — one sequential step per lane. Each step loops over
its lane's page chunks with a double-buffered DMA pipeline; the last chunk
of lane b prefetches lane b+1's first chunk (handoff tracked in SMEM), so
pages stream continuously across the whole grid. Inactive lanes
(kv_len == 0) cost one handoff branch. m/l are stored lane-replicated
[G, 128] per kv head so every softmax update is a plain elementwise VPU op.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B] context length per lane (0 = inactive)
    page_indices_ref,  # i32[B, W]
    # inputs
    q_ref,             # [1, Hq, D] this lane's query
    pages_hbm,         # [P, ps, 2Hk, D] page pool (ANY/HBM)
    # output
    o_ref,             # [1, Hq, D]
    # scratch
    kbuf,              # [2, CHUNK * ps, 2Hk, D] double-buffered chunks
    sems,              # DMA sems [2, CHUNK]
    buf_ref,           # SMEM i32[1]: buffer holding the in-flight chunk
    m_ref,             # f32[Hq, 128] running max (lane-replicated)
    l_ref,             # f32[Hq, 128] running denom
    acc_ref,           # f32[Hq, D]
    *,
    ps: int,
    chunk: int,
    num_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    kv_scale: float | None,
    interpret: bool,
):
    b = pl.program_id(0)
    B = pl.num_programs(0)
    Tc = chunk * ps
    G = num_heads // num_kv_heads

    def pages_in_chunk(bb, cc):
        npages = pl.cdiv(kv_lens_ref[bb], ps)
        return jnp.clip(npages - cc * chunk, 0, chunk)

    # Buffer banks are selected with static indices under pl.when: dynamic
    # (loop-carried) indexing of the semaphore array is the prime suspect
    # for a device-side deadlock observed with the earlier formulation (a
    # wait on the wrong semaphore hangs the core, unrecoverable remotely).
    def _issue_bank(bb, cc, bank: int):
        n = pages_in_chunk(bb, cc)
        for j in range(chunk):
            @pl.when(j < n)
            def _():
                pid = page_indices_ref[bb, cc * chunk + j]
                pltpu.make_async_copy(
                    pages_hbm.at[pid],
                    kbuf.at[bank, pl.ds(j * ps, ps)],
                    sems.at[bank, j]).start()

    def issue(bb, cc, buf):
        @pl.when(buf == 0)
        def _():
            _issue_bank(bb, cc, 0)

        @pl.when(buf == 1)
        def _():
            _issue_bank(bb, cc, 1)

    def _wait_bank(bb, cc, bank: int):
        n = pages_in_chunk(bb, cc)
        for j in range(chunk):
            @pl.when(j < n)
            def _():
                pltpu.make_async_copy(
                    pages_hbm.at[0],
                    kbuf.at[bank, pl.ds(j * ps, ps)],
                    sems.at[bank, j]).wait()

    def wait(bb, cc, buf):
        @pl.when(buf == 0)
        def _():
            _wait_bank(bb, cc, 0)

        @pl.when(buf == 1)
        def _():
            _wait_bank(bb, cc, 1)

    # pipeline invariant at entry: if lane b is active, its chunk 0 is in
    # flight in buffer buf_ref[0] (issued by the previous lane's handoff)
    @pl.when(b == 0)
    def _():
        buf_ref[0] = 0
        issue(0, 0, 0)

    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    nch = pl.cdiv(kv_lens_ref[b], Tc)
    k_scale = sm_scale * (kv_scale if kv_scale is not None else 1.0)

    def body(c, buf):
        nxt = 1 - buf
        # prefetch the next chunk (or hand off to the next lane) before
        # consuming this one
        @pl.when(c + 1 < nch)
        def _():
            issue(b, c + 1, nxt)

        @pl.when((c + 1 == nch) & (b + 1 < B))
        def _():
            issue(b + 1, 0, nxt)

        wait(b, c, buf)
        kv = kbuf[buf]                          # [Tc, 2Hk, D] raw dtype
        pos = c * Tc + jax.lax.broadcasted_iota(jnp.int32, (1, Tc), 1)
        valid = pos < kv_lens_ref[b]            # [1, Tc]
        q = q_ref[0]                            # [Hq, D]
        if interpret:
            # interpret-mode scratch is NaN-initialized; rows past kv_len
            # were never DMA'd and would poison p @ v via 0 * NaN. On
            # hardware stale VMEM holds finite old KV rows and the masked
            # softmax zeroes their weights — no sanitization needed.
            D = acc_ref.shape[1]
            pcol = c * Tc + jax.lax.broadcasted_iota(jnp.int32, (Tc, D), 0)
            kv = jnp.where((pcol < kv_lens_ref[b])[:, None, :]
                           .repeat(kv.shape[1], 1), kv, jnp.zeros_like(kv))
        for h in range(num_kv_heads):
            k = kv[:, 2 * h, :].astype(q.dtype)          # [Tc, D]
            v = kv[:, 2 * h + 1, :].astype(q.dtype)
            qh = q[h * G:(h + 1) * G]                    # [G, D]
            s = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * k_scale  # [G, Tc]
            s = jnp.where(valid, s, _NEG_INF)
            r = slice(h * G, (h + 1) * G)
            m_old = m_ref[r]                    # [G, 128] lane-replicated
            s_max = jnp.max(s, axis=1, keepdims=True)    # [G, 1]
            m_new = jnp.maximum(m_old, jnp.broadcast_to(s_max, m_old.shape))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.exp(s - m_new[:, :1])                # [G, Tc]
            l_ref[r] = l_ref[r] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), alpha.shape)
            pv = jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [G, D]
            if kv_scale is not None:
                pv = pv * kv_scale
            acc_ref[r] = acc_ref[r] * alpha + pv
            m_ref[r] = m_new
        return nxt

    final_buf = jax.lax.fori_loop(0, nch, body, buf_ref[0])

    @pl.when(nch > 0)
    def _():
        buf_ref[0] = final_buf

    # an inactive lane consumed nothing: hand the pipeline to the next lane
    @pl.when((nch == 0) & (b + 1 < B))
    def _():
        issue(b + 1, 0, buf_ref[0])

    o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_scale", "chunk",
                                             "interpret"))
def flash_decode_attention(q, kv_pages, kv_lens, page_indices, *,
                           sm_scale: float, kv_scale: float | None = None,
                           chunk: int = 16, interpret: bool = False):
    """q [B, Hq, D] (one token per lane) against paged KV.

    kv_pages [P, ps, 2Hk, D] (K even / V odd combined heads); kv_lens i32[B]
    with 0 marking inactive lanes; page_indices i32[B, W]. Returns
    [B, Hq, D] in q's dtype.
    """
    B, Hq, D = q.shape
    P, ps, Hk2, _ = kv_pages.shape
    Hk = Hk2 // 2
    # the lane-replicated m/l scratch is sized [Hq, 128] and broadcast
    # against [G, D] accumulators — other head_dims need resized scratch
    assert D == 128, f"flash_decode_attention requires head_dim 128, got {D}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk * ps, Hk2, D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, ps=ps, chunk=chunk, num_heads=Hq,
                          num_kv_heads=Hk, sm_scale=sm_scale,
                          kv_scale=kv_scale, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(kv_lens, page_indices, q, kv_pages)
