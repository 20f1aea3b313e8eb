"""Staged hardware validation + tuning sweep for ops/pallas/flash_decode.

A hung Pallas kernel wedges the tunneled chip for hours, so validation is
staged smallest-first and each stage is a separate process invocation the
caller wraps in ``timeout``:

  timeout 120 python tools/flash_decode_validate.py smoke     # tiny shapes
  timeout 300 python tools/flash_decode_validate.py parity    # vs library
  timeout 300 python tools/flash_decode_validate.py rowscale  # rs modes
  timeout 580 python tools/flash_decode_validate.py sweep     # lanes x chunk

Progress prints flush line-by-line; if a stage wedges, the LAST printed line
names the exact config that hung. Never run `sweep` before `smoke` passes.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

Hq, Hk, D, PS = 16, 8, 128, 64


def say(msg):
    print(msg, flush=True)


def make_pool(P, dtype=jnp.bfloat16):
    k = jax.random.key(0)
    x = jax.random.normal(k, (P, PS, 2 * Hk, D), jnp.float32)
    return (x * 0.3).astype(dtype)


def make_batch(B, ctx, P, seed=1):
    rng = np.random.default_rng(seed)
    W = max(2, (ctx + PS - 1) // PS)
    kv_lens = np.full(B, ctx, np.int32)
    pi = np.stack([rng.permutation(P)[:W] for _ in range(B)]).astype(np.int32)
    q = jax.random.normal(jax.random.key(seed + 1), (B, Hq, D), jnp.bfloat16)
    return q, jnp.asarray(kv_lens), jnp.asarray(pi)


def library_ref(q, pool, kv_lens, pi, kv_scale=None):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)
    B = q.shape[0]
    cu = jnp.arange(B + 1, dtype=jnp.int32)
    num = jnp.asarray([B], jnp.int32)
    return ragged_paged_attention(
        q, pool, kv_lens, pi, cu, num, sm_scale=0.0883,
        k_scale=kv_scale, v_scale=kv_scale,
        num_kv_pages_per_block=min(16, pi.shape[1]),
        num_queries_per_block=8, vmem_limit_bytes=100 * 2**20)


def maxdiff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def flash(q, pool, kv_lens, pi, **kw):
    from nanovllm_tpu.ops.pallas.flash_decode import flash_decode_attention
    return flash_decode_attention(q, pool, kv_lens, pi, sm_scale=0.0883, **kw)


def smoke():
    say("smoke: pool P=8 bf16")
    pool = make_pool(8)
    q, lens, pi = make_batch(B=8, ctx=65, P=8)
    say("smoke: compile+run lanes=8 chunk=1 ...")
    out = flash(q, pool, lens, pi, chunk=1, lanes_per_step=8)
    say(f"smoke: readback {np.asarray(out[:1, :1, :4])!r}")
    ref = library_ref(q, pool, lens, pi)
    say(f"smoke: maxdiff vs library = {maxdiff(out, ref):.5f}")
    say("smoke: inactive lanes (kv_len=0)")
    lens0 = lens.at[3].set(0)
    out = flash(q, pool, lens0, pi, chunk=2, lanes_per_step=4)
    np.asarray(out[3, :1, :2])
    say("smoke OK")


def parity():
    P = 512
    for name, pool, kv_scale in [
        ("bf16", make_pool(P), None),
        ("int8", (make_pool(P, jnp.float32) / 0.0625).round()
         .clip(-127, 127).astype(jnp.int8), 0.0625),
    ]:
        q, lens, pi = make_batch(B=64, ctx=512, P=P)
        say(f"parity[{name}]: flash ...")
        out = flash(q, pool, lens, pi, kv_scale=kv_scale,
                    chunk=4, lanes_per_step=8)
        np.asarray(out[:1, :1, :1])
        say(f"parity[{name}]: library ...")
        ref = library_ref(q, pool, lens, pi, kv_scale=kv_scale)
        d = maxdiff(out, ref)
        say(f"parity[{name}]: maxdiff = {d:.5f} "
            f"{'OK' if d < 2e-2 else 'FAIL'}")


def rowscale():
    from nanovllm_tpu.ops.attention import quantize_kv, unpack_int4
    P = 256
    raw = jax.random.normal(jax.random.key(7), (P * PS, 2 * Hk, D), jnp.float32)
    for kind in ("int8_rs", "int4_rs"):
        stored, scales = quantize_kv(raw, (kind, None))
        Dp = D // 2 if kind == "int4_rs" else D
        pool = stored.reshape(P, PS, 2 * Hk, Dp)
        spool = scales.reshape(P, PS, 2 * Hk)
        q, lens, pi = make_batch(B=32, ctx=256, P=P)
        say(f"rowscale[{kind}]: flash ...")
        out = flash(q, pool, lens, pi, kv_scales=spool, kv_mode=kind,
                    chunk=4, lanes_per_step=8)
        np.asarray(out[:1, :1, :1])
        # bf16 dequantized pool through the library kernel as oracle
        unp = unpack_int4(stored) if kind == "int4_rs" else stored
        deq = (unp.astype(jnp.float32) * scales.astype(jnp.float32)[..., None]
               ).astype(jnp.bfloat16).reshape(P, PS, 2 * Hk, D)
        ref = library_ref(q, deq, lens, pi)
        d = maxdiff(out, ref)
        say(f"rowscale[{kind}]: maxdiff vs dequant-library = {d:.5f} "
            f"{'OK' if d < 3e-2 else 'FAIL'}")


def _time_attn(fn, n=20):
    """Chained timing: data-dependent q so calls serialize; sync via tiny
    readback; subtract probe RTT."""
    t0 = time.perf_counter()
    probe = jax.jit(lambda x: jnp.sum(x[:1, :1, :1]).astype(jnp.float32))
    out = fn(None)
    float(probe(out))
    rtt_t = time.perf_counter()
    float(probe(out))
    rtt = time.perf_counter() - rtt_t
    t = time.perf_counter()
    for _ in range(n):
        out = fn(out)
    float(probe(out))
    return (time.perf_counter() - t - rtt) / n


def sweep():
    from nanovllm_tpu.ops.attention import quantize_kv
    B, ctx = 256, 1024
    P = 4200
    say(f"sweep: B={B} ctx={ctx} (decode bench shape)")
    # int8 global-scale pool (current bench default)
    pool8 = (make_pool(P, jnp.float32) / 0.0625).round().clip(-127, 127).astype(jnp.int8)
    q, lens, pi = make_batch(B=B, ctx=ctx, P=P)

    def lib_fn(prev):
        qq = q if prev is None else q + prev.astype(q.dtype) * 0
        return library_ref(qq, pool8, lens, pi, kv_scale=0.0625)

    t_lib = _time_attn(lib_fn)
    say(f"sweep: library int8 (16,8): {t_lib*1e3:.3f} ms")

    for lanes in (4, 8, 16):
        for chunk in (2, 4, 8):
            def fn(prev, lanes=lanes, chunk=chunk):
                qq = q if prev is None else q + prev.astype(q.dtype) * 0
                return flash(qq, pool8, lens, pi, kv_scale=0.0625,
                             chunk=chunk, lanes_per_step=lanes)
            t = _time_attn(fn)
            say(f"sweep: flash int8 lanes={lanes} chunk={chunk}: "
                f"{t*1e3:.3f} ms ({t/t_lib:.2f}x library)")

    raw = jax.random.normal(jax.random.key(9), (P * PS, 2 * Hk, D), jnp.float32)
    stored, scales = quantize_kv(raw, ("int4_rs", None))
    pool4 = stored.reshape(P, PS, 2 * Hk, D // 2)
    spool = scales.reshape(P, PS, 2 * Hk)
    for lanes in (4, 8, 16):
        for chunk in (2, 4, 8):
            def fn(prev, lanes=lanes, chunk=chunk):
                qq = q if prev is None else q + prev.astype(q.dtype) * 0
                return flash(qq, pool4, lens, pi, kv_scales=spool,
                             kv_mode="int4_rs", chunk=chunk,
                             lanes_per_step=lanes)
            t = _time_attn(fn)
            say(f"sweep: flash int4_rs lanes={lanes} chunk={chunk}: "
                f"{t*1e3:.3f} ms ({t/t_lib:.2f}x library-int8)")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    say(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    {"smoke": smoke, "parity": parity, "rowscale": rowscale,
     "sweep": sweep}[stage]()
