"""Feasibility probe: int4 KV pages through the ragged attention kernel and
the in-tree kv-store DMA kernels, on the real chip.

The in-tree ragged_paged_attention reads packed sub-byte dtypes via uint32
bitcast + shifts (kernel.py strided_load_kv, packing=8 for int4); this probe
checks it end-to-end: correctness vs a bf16 oracle and per-call latency vs
int8/bf16 pages at a decode-realistic shape.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import nanovllm_tpu  # noqa: F401 - persistent jit cache

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


def main():
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)

    rtt = probe_rtt()
    print(f"RTT {rtt*1e3:.1f} ms kind={jax.devices()[0].device_kind}", flush=True)

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

    def run(pages, scale, bkv, bq):
        fn = jax.jit(partial(
            ragged_paged_attention, sm_scale=0.0883,
            k_scale=scale, v_scale=scale,
            num_kv_pages_per_block=bkv, num_queries_per_block=bq,
            vmem_limit_bytes=100 * 2**20))
        return fn(q, pages, kv_lens, page_indices, cu, num)

    # oracle on bf16 pages
    o_ref = np.asarray(run(ref_pages, None, 8, 16))

    print("oracle done", flush=True)

    # int8 baseline (quantize INSIDE jit: eager sub-byte/scalar-constant ops
    # can wedge the tunneled transport)
    s8 = 2.0 / 127.0 * 4.0
    pages_i8 = jax.jit(lambda p: jnp.clip(
        jnp.round(p.astype(jnp.float32) / s8), -127, 127).astype(jnp.int8))(ref_pages)
    o_i8 = np.asarray(run(pages_i8, s8, 8, 16))
    err8 = np.mean(np.abs(o_i8 - o_ref)) / (np.mean(np.abs(o_ref)) + 1e-9)
    print(f"int8 rel err: {err8:.4f}", flush=True)

    # int4
    s4 = 2.0 / 7.0 * 4.0
    pages_i4 = jax.jit(lambda p: jnp.clip(
        jnp.round(p.astype(jnp.float32) / s4), -7, 7).astype(jnp.int4))(ref_pages)
    try:
        o_i4 = np.asarray(run(pages_i4, s4, 8, 16))
        err4 = np.mean(np.abs(o_i4 - o_ref)) / (np.mean(np.abs(o_ref)) + 1e-9)
        print(f"int4 rel err: {err4:.4f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int4 attention FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return

    # latency sweep int4 vs int8 at a few blocks
    for bkv, bq in ((8, 16), (16, 16), (32, 16), (16, 8)):
        for tag, pages, scale in (("int8", pages_i8, s8), ("int4", pages_i4, s4)):
            @partial(jax.jit, donate_argnums=(0,), static_argnums=(2, 3))
            def step(q, pages, bkv, bq, scale=scale):
                o = ragged_paged_attention(
                    q, pages, kv_lens, page_indices, cu, num,
                    sm_scale=0.0883, k_scale=scale, v_scale=scale,
                    num_kv_pages_per_block=bkv, num_queries_per_block=bq,
                    vmem_limit_bytes=100 * 2**20)
                return o * 1e-3
            try:
                timed(f"decode B={B} ctx={ctx} {tag} bkv={bkv} bq={bq}",
                      lambda qq, bkv=bkv, bq=bq, pages=pages: step(qq, pages, bkv, bq),
                      jnp.asarray(np.asarray(q)), 30, rtt)
            except Exception as e:  # noqa: BLE001
                print(f"{tag} bkv={bkv} bq={bq} FAILED: {type(e).__name__}",
                      flush=True)

    # store kernels with int4 rows
    from nanovllm_tpu.ops.pallas.kv_store import kv_store_rows
    kv_new = jax.jit(lambda x: jnp.clip(
        jnp.round(x / s4), -7, 7).astype(jnp.int4))(
        jax.random.normal(k, (B, 2 * Hk, D), jnp.float32))
    row_src = jnp.arange(B, dtype=jnp.int32)
    row_page = jnp.arange(B, dtype=jnp.int32) % (P - 1)
    row_pos = jnp.zeros(B, jnp.int32)
    try:
        out = kv_store_rows(pages_i4, kv_new, row_src, row_page, row_pos)
        got = np.asarray(out[np.asarray(row_page)[:4], 0].astype(jnp.int8))
        want = np.asarray(kv_new[:4].astype(jnp.int8))
        ok = np.array_equal(got, want)
        print(f"int4 kv_store_rows: {'OK' if ok else 'MISMATCH'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int4 kv_store_rows FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
