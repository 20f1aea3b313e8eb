"""Sweep ragged_paged_attention block sizes at engine-realistic shapes.

The in-tree kernel looks up (num_kv_pages_per_block, num_queries_per_block)
from an auto-tuned table keyed by device + shape; our shape (Hq=16, Hk=8,
D=128, page=64) has NO entries for 'TPU v5', so it silently runs the untuned
fallback (bkv=128 pages, bq=32). This sweeps both knobs at the bench's prefill
and decode shapes and prints ms/call per config (tunnel-safe timing: chained
donated calls + 1-element probe sync, RTT subtracted).

Usage: python tools/attn_tune.py [prefill|decode|all]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import nanovllm_tpu  # noqa: F401 - enables the persistent jit cache

Hq, Hk, D, PS = 16, 8, 128, 64
P = 1749  # pages in pool (bench-realistic)
W = 64    # table width (4096 / 64)


def probe_rtt():
    f = jax.jit(lambda x: jnp.sum(x[:1, :1]).astype(jnp.float32))
    x = jnp.ones((4, 128))
    float(f(x))
    t = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t


def sync(x):
    return float(jnp.sum(x.ravel()[:1]).astype(jnp.float32))


def timed(name, step, state, n, rtt):
    state = step(state)
    sync(state)
    t = time.perf_counter()
    for _ in range(n):
        state = step(state)
    sync(state)
    dt = (time.perf_counter() - t - rtt) / n
    print(f"{name}: {dt*1e3:.3f} ms/call", flush=True)
    return dt


KV_DTYPE = jnp.bfloat16  # int8 via NANOVLLM_TUNE_KV=int8 (the bench default)
KV_SCALE = None


def make_case(num_seqs, q_per_seq, ctx):
    """Concatenated q stream of num_seqs seqs, each q_per_seq new tokens
    attending to ctx total context."""
    k = jax.random.key(0)
    T = num_seqs * q_per_seq
    q = jax.random.normal(k, (T, Hq, D), jnp.bfloat16)
    if KV_DTYPE == jnp.int8:
        pages = jax.random.randint(k, (P, PS, 2 * Hk, D), -127, 128, jnp.int8)
    else:
        pages = jax.random.normal(k, (P, PS, 2 * Hk, D), KV_DTYPE)
    kv_lens = jnp.full(num_seqs, ctx, jnp.int32)
    pi = np.zeros((num_seqs, W), np.int32)
    rng = np.random.default_rng(0)
    for i in range(num_seqs):
        pi[i] = rng.permutation(P - 1)[:W]
    page_indices = jnp.asarray(pi)
    cu = jnp.arange(num_seqs + 1, dtype=jnp.int32) * q_per_seq
    num = jnp.array([num_seqs], jnp.int32)
    return q, pages, kv_lens, page_indices, cu, num


def sweep(tag, case, bkvs, bqs, rtt, n=30):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)
    from functools import partial
    q, pages, kv_lens, page_indices, cu, num = case
    q_host = np.asarray(q)  # pristine copy: q is donated away by each chain
    results = {}
    # pages passed as an ARG — closure constants this big get baked into the
    # HLO and kill the remote-compile transport
    for bkv in bkvs:
        for bq in bqs:
            @partial(jax.jit, donate_argnums=(0,), static_argnums=(2, 3))
            def step(q, pages, bkv, bq):
                o = ragged_paged_attention(
                    q, pages, kv_lens, page_indices, cu, num,
                    sm_scale=0.0883, num_kv_pages_per_block=bkv,
                    num_queries_per_block=bq,
                    k_scale=KV_SCALE, v_scale=KV_SCALE,
                    vmem_limit_bytes=100 * 2**20)
                return o * 1e-3
            try:
                dt = timed(f"{tag} bkv={bkv} bq={bq}",
                           lambda q, bkv=bkv, bq=bq: step(q, pages, bkv, bq),
                           jnp.asarray(q_host), n, rtt)
                results[(bkv, bq)] = dt
            except Exception as e:  # noqa: BLE001 - sweep survives bad configs
                print(f"{tag} bkv={bkv} bq={bq}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:100]}", flush=True)
    if results:
        (bkv, bq), dt = min(results.items(), key=lambda kv: kv[1])
        print(f"BEST {tag}: bkv={bkv} bq={bq} {dt*1e3:.3f} ms", flush=True)

    @partial(jax.jit, donate_argnums=(0,))
    def step_default(q, pages):
        o = ragged_paged_attention(q, pages, kv_lens, page_indices, cu, num,
                                   sm_scale=0.0883,
                                   k_scale=KV_SCALE, v_scale=KV_SCALE,
                                   vmem_limit_bytes=100 * 2**20)
        return o * 1e-3
    timed(f"{tag} DEFAULT", lambda q: step_default(q, pages),
          jnp.asarray(q_host), n, rtt)


if __name__ == "__main__":
    import os
    if os.environ.get("NANOVLLM_TUNE_KV") == "int8":
        KV_DTYPE, KV_SCALE = jnp.int8, 0.05
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rtt = probe_rtt()
    print(f"probe RTT: {rtt*1e3:.1f} ms backend={jax.default_backend()} "
          f"kind={jax.devices()[0].device_kind} kv={KV_DTYPE.__name__}", flush=True)
    if which in ("prefill", "all"):
        # bench-realistic prefill: 16 seqs x 1024 new tokens, no cached prefix
        case = make_case(16, 1024, 1024)
        sweep("prefill T=16k ctx=1k", case, (4, 8, 16, 32, 64), (32, 64, 128, 256), rtt)
    if which in ("decode", "all"):
        # decode: 256 lanes, 1 q each, ctx 1024
        case = make_case(256, 1, 1024)
        sweep("decode B=256 ctx=1k", case, (4, 8, 16, 32, 64), (8, 16, 32), rtt)
    if which.startswith("decodeB"):
        # decodeB<B>[:ctx] — sweep one decode batch size
        spec = which[len("decodeB"):]
        B, _, ctx = spec.partition(":")
        B, ctx = int(B), int(ctx or 1024)
        case = make_case(B, 1, ctx)
        sweep(f"decode B={B} ctx={ctx}", case, (2, 4, 8, 16), (4, 8, 16), rtt)
