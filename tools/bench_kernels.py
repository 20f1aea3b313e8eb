"""Kernel microbenchmarks with tunnel-safe timing.

On a tunneled PJRT backend (axon), two measurement traps bite:
- ``np.asarray(big_array)`` drags the whole buffer through a ~25 MB/s tunnel;
- ``block_until_ready`` appears to return at enqueue, not completion.
So: chain N donated calls (real data dependency), then sync on a 1-element
probe reduced from the result, and subtract the measured probe RTT.

Usage: python tools/bench_kernels.py [store|attn|matmul|decode|all] [B] [K]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

Hk, D, PS = 8, 128, 64
P = 1749


def probe_rtt():
    f = jax.jit(lambda x: jnp.sum(x[:1, :1]).astype(jnp.float32))
    x = jnp.ones((4, 128))
    float(f(x))
    t = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].ravel()[:1]).astype(jnp.float32))


def timed_chain(name, step, state, n, rtt):
    """step: state -> state (donated); prints per-call ms after warmup."""
    state = step(state)
    sync(state)
    t = time.perf_counter()
    for _ in range(n):
        state = step(state)
    sync(state)
    dt = (time.perf_counter() - t - rtt) / n
    print(f"{name}: {dt*1e3:.3f} ms/call", flush=True)
    return dt


def bench_store(B, rtt):
    from nanovllm_tpu.ops.pallas.kv_store import kv_store, kv_store_rows
    k = jax.random.key(0)
    kv_new = jax.random.normal(k, (max(B, PS), 2 * Hk, D), jnp.bfloat16)
    row_src = jnp.arange(B, dtype=jnp.int32)
    row_page = jnp.arange(B, dtype=jnp.int32) % (P - 1)
    row_pos = jnp.zeros(B, jnp.int32)

    rows_don = jax.jit(
        lambda pages: kv_store_rows(pages, kv_new, row_src, row_page, row_pos),
        donate_argnums=(0,))
    timed_chain(f"rows-unrolled B={B}", rows_don,
                jnp.zeros((P, PS, 2 * Hk, D), jnp.bfloat16), 50, rtt)

    page_src = jnp.zeros(1, jnp.int32)
    page_dst = jnp.zeros(1, jnp.int32)
    counts = jnp.array([0, B], jnp.int32)
    ring_don = jax.jit(
        lambda pages: kv_store(pages, kv_new, page_src, page_dst, row_src,
                               row_page, row_pos, counts, page_size=PS),
        donate_argnums=(0,))
    timed_chain(f"ring-grid B={B} (grid={1+B})", ring_don,
                jnp.zeros((P, PS, 2 * Hk, D), jnp.bfloat16), 50, rtt)

    def xla_scatter(pages):
        flat = pages.reshape(P * PS, 2 * Hk, D)
        flat = flat.at[row_page * PS + row_pos].set(kv_new[:B])
        return flat.reshape(P, PS, 2 * Hk, D)
    timed_chain(f"xla-scatter B={B}", jax.jit(xla_scatter, donate_argnums=(0,)),
                jnp.zeros((P, PS, 2 * Hk, D), jnp.bfloat16), 50, rtt)

    # prefill-shaped: 8 seqs x 4 full pages each
    nsq = 8
    kv_big = jax.random.normal(k, (nsq * 4 * PS, 2 * Hk, D), jnp.bfloat16)
    psrc = jnp.arange(nsq * 4, dtype=jnp.int32) * PS
    pdst = jnp.arange(nsq * 4, dtype=jnp.int32)
    counts2 = jnp.array([nsq * 4, 0], jnp.int32)
    rs = jnp.zeros(nsq, jnp.int32)
    ring2 = jax.jit(
        lambda pages: kv_store(pages, kv_big, psrc, pdst, rs, rs, rs, counts2,
                               page_size=PS),
        donate_argnums=(0,))
    timed_chain(f"ring-grid prefill 32 pages (grid={nsq*4+nsq})", ring2,
                jnp.zeros((P, PS, 2 * Hk, D), jnp.bfloat16), 50, rtt)


def bench_attn(B, rtt):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)
    k = jax.random.key(0)
    # pages passed as an ARG (a closure constant this big gets baked into the
    # HLO and kills the remote-compile transport)
    pages = jax.random.normal(k, (P, PS, 2 * Hk, D), jnp.bfloat16)
    q = jax.random.normal(k, (B, 16, D), jnp.bfloat16)
    W = 64
    kv_lens = jnp.full(B, 1024, jnp.int32)
    page_indices = jnp.tile(jnp.arange(W, dtype=jnp.int32)[None], (B, 1))
    cu = jnp.arange(B + 1, dtype=jnp.int32)
    num_seqs = jnp.array([B], jnp.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def step(q, pages):
        o = ragged_paged_attention(q, pages, kv_lens, page_indices, cu,
                                   num_seqs, sm_scale=0.0883,
                                   vmem_limit_bytes=100 * 2**20)
        return o * 1e-3  # keep values bounded through the chain
    timed_chain(f"ragged-paged-attn B={B} ctx1024", lambda q: step(q, pages),
                q, 50, rtt)


def bench_matmul(rtt):
    L, H, I = 28, 1024, 3072
    k = jax.random.key(0)
    Ws = {
        "qkv": jax.random.normal(k, (L, H, 4096), jnp.bfloat16),
        "o": jax.random.normal(k, (L, 2048, H), jnp.bfloat16),
        "gu": jax.random.normal(k, (L, H, 2 * I), jnp.bfloat16),
        "dn": jax.random.normal(k, (L, I, H), jnp.bfloat16),
    }
    @partial(jax.jit, donate_argnums=(0,))
    def chain(x, Ws):
        def body(x, w):
            a = x @ w["qkv"]
            x = a[:, :2048] @ w["o"]
            g = x @ w["gu"]
            x = (g[:, :I] * jax.nn.silu(g[:, I:])) @ w["dn"]
            return x * 1e-2, None
        x, _ = jax.lax.scan(body, x, Ws)
        return x
    for B in (64, 256):
        timed_chain(f"matmul-chain 28L T={B}", lambda x: chain(x, Ws),
                    jax.random.normal(k, (B, H), jnp.bfloat16), 30, rtt)
    Wv = jax.random.normal(k, (151936, 1024), jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(0,))
    def head(x, Wv):
        return (jnp.dot(x, Wv.T, preferred_element_type=jnp.float32)
                .argmax(-1).astype(jnp.float32)[None, :] * 0 + x)
    for B in (64, 256):
        timed_chain(f"lm-head {B}x151936", lambda x: head(x, Wv),
                    jax.random.normal(k, (B, 1024), jnp.bfloat16), 30, rtt)


def bench_decode(B, K, rtt):
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams
    from nanovllm_tpu.utils.model_path import get_model_path

    import os
    cfg = Config(model=get_model_path(), max_model_len=4096,
                 kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", "auto"))
    runner = ModelRunner(cfg)
    npages = cfg.num_kvcache_blocks
    seqs = []
    for i in range(B):
        s = Sequence(list(range(100)), SamplingParams(max_tokens=512, ignore_eos=True))
        s.block_table = [(8 * i + j) % npages for j in range(8)]
        s.slot = i
        s.num_sched_tokens = 100
        seqs.append(s)

    toks = runner.run_decode(seqs, [K] * B, K)
    sync(toks)
    n = 20
    t = time.perf_counter()
    for _ in range(n):
        for s in seqs:
            s.num_sched_tokens = 100
        toks = runner.run_decode(seqs, [K] * B, K)
    sync(toks)
    dt = (time.perf_counter() - t - rtt) / n
    print(f"decode-scan B={B} K={K}: {dt*1e3:.1f} ms/call = "
          f"{dt/K*1e3:.2f} ms/step -> {B*K/dt:.0f} tok/s", flush=True)


def bench_prefill(nseq, seqlen, rtt):
    """Engine prefill call at a bench-realistic shape (nseq seqs x seqlen
    fresh tokens), repeated with rotated page tables."""
    import os
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams
    from nanovllm_tpu.utils.model_path import get_model_path

    cfg = Config(model=get_model_path(), max_model_len=4096,
                 kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", "auto"))
    runner = ModelRunner(cfg)
    npages = cfg.num_kvcache_blocks
    pages_per_seq = (seqlen + PS - 1) // PS

    def make_seqs(offset):
        seqs = []
        for i in range(nseq):
            s = Sequence(list(range(seqlen)),
                         SamplingParams(max_tokens=8, ignore_eos=True))
            s.block_table = [(offset + i * pages_per_seq + j) % npages
                             for j in range(pages_per_seq)]
            s.slot = i
            seqs.append(s)
        return seqs

    toks = runner.run_prefill(make_seqs(0))
    sync(toks)
    n = 15
    t = time.perf_counter()
    for r in range(n):
        toks = runner.run_prefill(make_seqs((r + 1) * nseq * pages_per_seq))
    sync(toks)
    dt = (time.perf_counter() - t - rtt) / n
    tot = nseq * seqlen
    print(f"prefill {nseq}x{seqlen} ({tot} tok): {dt*1e3:.1f} ms/call -> "
          f"{tot/dt:.0f} tok/s", flush=True)


def bench_qmm(rtt):
    """Quantized GEMM roofline: W8A8 per-row (XLA int8 MXU dot + scale
    epilogue) and the fused Pallas per-group dequant GEMM, at prefill-like
    (compute-bound) and decode-like (weight-read-bound) shapes. v5e peak:
    ~394 int8 TOPS / ~197 bf16 TFLOPs / ~819 GB/s HBM."""
    from nanovllm_tpu.ops.quantization import (
        per_group_quant, per_row_quant, quant_act_per_row, w8a8_matmul,
        weight_only_matmul)

    k = jax.random.key(0)
    PEAK_INT8 = 394e12
    PEAK_HBM = 819e9
    for M, K, N in ((8192, 1024, 4096), (8192, 3072, 1024), (256, 1024, 4096)):
        w = jax.random.normal(k, (K, N), jnp.bfloat16)
        x_host = np.asarray(jax.random.normal(k, (M, K), jnp.bfloat16))
        w_q, sw = per_row_quant(w)  # [K, N] -> per-out-channel scale [N]
        flops = 2.0 * M * K * N

        @partial(jax.jit, donate_argnums=(0,))
        def step_w8a8(x, w_q, sw):
            x_q, sx = quant_act_per_row(x)
            o = w8a8_matmul(x_q, sx, w_q, sw)
            return o[:, :K] * 1e-3 if N >= K else jnp.pad(o, ((0, 0), (0, K - N))) * 1e-3

        dt = timed_chain(f"w8a8 per-row M={M} K={K} N={N}",
                         lambda x: step_w8a8(x, w_q, sw),
                         jnp.asarray(x_host), 200, rtt)
        util = flops / dt / PEAK_INT8
        bw = (M * K + K * N + 2 * M * N) / dt / PEAK_HBM
        print(f"  -> {flops/dt/1e12:.1f} TOPS ({util*100:.0f}% of int8 peak, "
              f"{bw*100:.0f}% of HBM)", flush=True)

        from nanovllm_tpu.ops.pallas.quant_matmul import w8a8_matmul_act_fused

        @partial(jax.jit, donate_argnums=(0,))
        def step_w8a8_fused(x, w_q, sw):
            o = w8a8_matmul_act_fused(x, w_q, sw, out_dtype=jnp.bfloat16)
            return o[:, :K] * 1e-3 if N >= K else jnp.pad(o, ((0, 0), (0, K - N))) * 1e-3

        dt = timed_chain(f"w8a8 act-fused M={M} K={K} N={N}",
                         lambda x: step_w8a8_fused(x, w_q, sw),
                         jnp.asarray(x_host), 200, rtt)
        util = flops / dt / PEAK_INT8
        bw = (2 * M * K + K * N + 2 * M * N) / dt / PEAK_HBM  # x read as bf16
        print(f"  -> {flops/dt/1e12:.1f} TOPS ({util*100:.0f}% of int8 peak, "
              f"{bw*100:.0f}% of HBM) [quant in prologue]", flush=True)

        wg_q, sg = per_group_quant(w, group_size=128)

        @partial(jax.jit, donate_argnums=(0,))
        def step_group(x, wg_q, sg):
            o = weight_only_matmul(x, wg_q, sg, group_size=128,
                                   out_dtype=jnp.bfloat16)
            return o[:, :K] * 1e-3 if N >= K else jnp.pad(o, ((0, 0), (0, K - N))) * 1e-3

        dt = timed_chain(f"group-dequant g=128 M={M} K={K} N={N}",
                         lambda x: step_group(x, wg_q, sg),
                         jnp.asarray(x_host), 200, rtt)
        util = flops / dt / 197e12
        bw = (M * K * 2 + K * N + 2 * M * N) / dt / PEAK_HBM
        print(f"  -> {flops/dt/1e12:.1f} TFLOPs ({util*100:.0f}% of bf16 peak, "
              f"{bw*100:.0f}% of HBM)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rtt = probe_rtt()
    print(f"probe RTT: {rtt*1e3:.1f} ms  backend={jax.default_backend()}", flush=True)
    if which in ("store", "all"):
        bench_store(B, rtt)
    if which in ("attn", "all"):
        bench_attn(B, rtt)
    if which in ("matmul", "all"):
        bench_matmul(rtt)
    if which in ("decode", "all"):
        bench_decode(B, K, rtt)
    if which == "prefill":
        # B = num seqs, K = tokens per seq
        bench_prefill(B, K, rtt)
    if which == "qmm":
        bench_qmm(rtt)
