"""Probe: int4-packed-in-int8 page pool, viewed as int4 inside the jit.

The tunneled PJRT client cannot pass int4 arrays across the jit boundary
(RecursionError on dispatch, UNIMPLEMENTED on readback), so the pool must be
an int8 buffer of packed nibbles. Inside the jit, bitcast_convert_type +
reshape produce the int4 operand for the ragged attention kernel. This probe
measures whether XLA aliases that view (attention should run ~2x faster than
int8 pages: half the HBM page reads) or materializes a copy of the pool.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import nanovllm_tpu  # noqa: F401

Hq, Hk, D, PS = 16, 8, 128, 64
P = 1749
W = 64


def probe_rtt():
    f = jax.jit(lambda x: jnp.sum(x[:1, :1]).astype(jnp.float32))
    x = jnp.ones((4, 128))
    float(f(x))
    t = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t


def timed(name, step, state, n, rtt):
    state = step(state)
    float(jnp.sum(state.ravel()[:1]).astype(jnp.float32))
    t = time.perf_counter()
    for _ in range(n):
        state = step(state)
    float(jnp.sum(state.ravel()[:1]).astype(jnp.float32))
    dt = (time.perf_counter() - t - rtt) / n
    print(f"{name}: {dt*1e3:.3f} ms/call", flush=True)
    return dt


def pack_int4(q4):
    """int8 nibble values [-7..7] [..., D] -> packed int8 [..., D//2].
    Little-endian pairing to match bitcast_convert_type(int8 -> int4)."""
    lo = q4[..., 0::2] & 0x0F
    hi = (q4[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_view(packed):
    """packed int8 [..., D//2] -> int4 view [..., D] inside jit."""
    v = jax.lax.bitcast_convert_type(packed, jnp.int4)  # [..., D//2, 2]
    return v.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def main():
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)

    rtt = probe_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    B, ctx = 256, 1024
    k = jax.random.key(0)
    q = jax.random.normal(k, (B, Hq, D), jnp.bfloat16)
    ref_pages = jax.random.normal(k, (P, PS, 2 * Hk, D), jnp.bfloat16) * 2.0
    kv_lens = jnp.full(B, ctx, jnp.int32)
    pi = np.zeros((B, W), np.int32)
    rng = np.random.default_rng(0)
    for i in range(B):
        pi[i] = rng.permutation(P - 1)[:W]
    page_indices = jnp.asarray(pi)
    cu = jnp.arange(B + 1, dtype=jnp.int32)
    num = jnp.array([B], jnp.int32)

    s4 = 2.0 / 7.0 * 4.0

    @jax.jit
    def quant_pack(p):
        q4 = jnp.clip(jnp.round(p.astype(jnp.float32) / s4), -7, 7
                      ).astype(jnp.int8)
        return pack_int4(q4)

    pool = quant_pack(ref_pages)  # int8 [P, PS, 2Hk, D//2]
    print("packed pool", pool.dtype, pool.shape, flush=True)

    # correctness vs bf16 oracle
    def attn(qq, pages, scale, bkv, bq):
        return ragged_paged_attention(
            qq, pages, kv_lens, page_indices, cu, num, sm_scale=0.0883,
            k_scale=scale, v_scale=scale,
            num_kv_pages_per_block=bkv, num_queries_per_block=bq,
            vmem_limit_bytes=100 * 2**20)

    o_ref = np.asarray(jax.jit(partial(attn, scale=None, bkv=8, bq=16))(
        q, ref_pages))

    @jax.jit
    def attn_i4(qq, pool):
        return attn(qq, unpack_view(pool), s4, 8, 16)

    try:
        o_i4 = np.asarray(attn_i4(q, pool))
    except Exception as e:  # noqa: BLE001
        print(f"int4-view attention FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}", flush=True)
        return
    err = np.mean(np.abs(o_i4 - o_ref)) / (np.mean(np.abs(o_ref)) + 1e-9)
    print(f"int4-view rel err vs bf16: {err:.4f}", flush=True)

    # int8 pages baseline timing
    s8 = 2.0 / 127.0 * 4.0
    pages_i8 = jax.jit(lambda p: jnp.clip(
        jnp.round(p.astype(jnp.float32) / s8), -127, 127).astype(jnp.int8)
    )(ref_pages)

    for bkv, bq in ((8, 16), (16, 16), (16, 8), (32, 16)):
        @partial(jax.jit, donate_argnums=(0,), static_argnums=(2, 3))
        def step8(qq, pages, bkv, bq):
            return attn(qq, pages, s8, bkv, bq) * 1e-3

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(2, 3))
        def step4(qq, pool, bkv, bq):
            return attn(qq, unpack_view(pool), s4, bkv, bq) * 1e-3

        q_host = np.asarray(q)
        try:
            timed(f"int8 B={B} ctx={ctx} bkv={bkv} bq={bq}",
                  lambda x, bkv=bkv, bq=bq: step8(x, pages_i8, bkv, bq),
                  jnp.asarray(q_host), 30, rtt)
        except Exception as e:  # noqa: BLE001
            print(f"int8 bkv={bkv} bq={bq} FAIL {type(e).__name__}", flush=True)
        try:
            timed(f"int4-view B={B} ctx={ctx} bkv={bkv} bq={bq}",
                  lambda x, bkv=bkv, bq=bq: step4(x, pool, bkv, bq),
                  jnp.asarray(q_host), 30, rtt)
        except Exception as e:  # noqa: BLE001
            print(f"int4 bkv={bkv} bq={bq} FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
