"""Library ragged-attention decode cost vs KV page size (int8 pages).

The kernel issues one DMA descriptor per page; at the bench decode shape
(B=256, ctx=1k) ps=64 means 4096 descriptors per layer-call. Larger pages
quarter the descriptor count at the cost of coarser prefix caching and more
padding waste per sequence (~ps/2 rows). This probe measures the kernel-side
term so the engine default (Config.kvcache_block_size) is chosen with
numbers.

  timeout 900 python tools/pagesize_probe.py

In-run ratios only: absolute ms varies ~2x with tunnel/chip load.
"""

import functools as ft
import sys
import time

sys.path.insert(0, ".")

import nanovllm_tpu

nanovllm_tpu.enable_persistent_jit_cache()

import jax
import jax.numpy as jnp
import numpy as np

Hq, Hk, D = 16, 8, 128
B, CTX = 256, 1024
KV_SCALE = 0.0625


def say(m):
    print(m, flush=True)


def probe_rtt():
    f = jax.jit(lambda x: jnp.sum(x[:1, :1]).astype(jnp.float32))
    x = jnp.ones((4, 128))
    float(f(x))
    t = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t


def timed(step, q0, n, rtt):
    state = step(jnp.asarray(q0))
    float(jnp.sum(state.ravel()[:1]).astype(jnp.float32))
    t = time.perf_counter()
    for _ in range(n):
        state = step(state)
    float(jnp.sum(state.ravel()[:1]).astype(jnp.float32))
    return (time.perf_counter() - t - rtt) / n


def main():
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)
    say(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rtt = probe_rtt()
    say(f"pagesize probe: B={B} ctx={CTX} int8 pages, RTT={rtt*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    q0 = np.asarray(jax.random.normal(jax.random.key(1), (B, Hq, D),
                                      jnp.bfloat16))
    cu = jnp.arange(B + 1, dtype=jnp.int32)
    num = jnp.asarray([B], jnp.int32)
    results = {}
    for ps in (64, 128, 256):
        W = CTX // ps
        P = B * W + 64          # same total KV bytes at every ps
        pool = (np.asarray(
            jax.random.normal(jax.random.key(0), (P, ps, 2 * Hk, D),
                              jnp.float32)) / KV_SCALE)
        pool = jnp.asarray(np.clip(np.round(pool), -127, 127), jnp.int8)
        lens = jnp.full((B,), CTX, jnp.int32)
        pi = jnp.asarray(
            np.stack([rng.permutation(P)[:W] for _ in range(B)]), jnp.int32)
        for bkv, bq in ((16, 8), (8, 8), (8, 16), (4, 8), (2, 8)):
            if bkv > W:
                continue

            @ft.partial(jax.jit, donate_argnums=(0,))
            def step(qq, pool=pool, lens=lens, pi=pi, bkv=bkv, bq=bq):
                o = ragged_paged_attention(
                    qq, pool, lens, pi, cu, num, sm_scale=0.0883,
                    k_scale=KV_SCALE, v_scale=KV_SCALE,
                    num_kv_pages_per_block=bkv, num_queries_per_block=bq,
                    vmem_limit_bytes=100 * 2**20)
                return (o * 1e-3).astype(qq.dtype)

            try:
                t = timed(step, q0, 20, rtt)
            except Exception as e:  # noqa: BLE001
                say(f"ps={ps} blocks=({bkv},{bq}): FAIL {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:90]}")
                continue
            say(f"ps={ps} blocks=({bkv},{bq}): {t*1e3:.3f} ms")
            results[(ps, bkv, bq)] = t
    if results:
        best = min(results, key=results.get)
        base = results.get((64, 16, 8))
        say(f"best: ps={best[0]} blocks={best[1:]} "
            f"{results[best]*1e3:.3f} ms"
            + (f" ({results[best]/base:.2f}x of ps=64 (16,8))" if base else ""))


if __name__ == "__main__":
    main()
