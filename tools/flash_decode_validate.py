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

import nanovllm_tpu

nanovllm_tpu.enable_persistent_jit_cache()

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


_LIB_CACHE = {}


def library_ref(q, pool, kv_lens, pi, kv_scale=None):
    """Jitted + cached wrapper: cu/num live on device so the timing loop
    isn't serialized by per-call H2D transfers (one RTT each on the tunnel)."""
    import functools as ft
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention)
    B = q.shape[0]
    key = (B, str(pool.dtype), pi.shape[1], kv_scale)
    if key not in _LIB_CACHE:
        fn = jax.jit(ft.partial(
            ragged_paged_attention, sm_scale=0.0883,
            k_scale=kv_scale, v_scale=kv_scale,
            num_kv_pages_per_block=min(16, pi.shape[1]),
            num_queries_per_block=8, vmem_limit_bytes=100 * 2**20))
        _LIB_CACHE[key] = (fn, jnp.arange(B + 1, dtype=jnp.int32),
                           jnp.asarray([B], jnp.int32))
    fn, cu, num = _LIB_CACHE[key]
    return fn(q, pool, kv_lens, pi, cu, num)


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
    from nanovllm_tpu.ops.attention import (quantize_kv, take_kv_scales,
                                            unpack_int4)
    P = 256
    raw = jax.random.normal(jax.random.key(7), (P * PS, 2 * Hk, D), jnp.float32)
    for kind in ("int8_rs", "int4_rs"):
        stored, scales = quantize_kv(raw, (kind, None))
        rh = Hk if kind == "int4_rs" else 2 * Hk
        pool = stored.reshape(P, PS, rh, D)
        spool = scales.reshape(P, PS, -1)
        q, lens, pi = make_batch(B=32, ctx=256, P=P)
        say(f"rowscale[{kind}]: flash ...")
        out = flash(q, pool, lens, pi, kv_scales=spool, kv_mode=kind,
                    chunk=4, lanes_per_step=8)
        np.asarray(out[:1, :1, :1])
        # bf16 dequantized pool through the library kernel as oracle
        # (rs pools are K-first; restripe to the library's interleave)
        unp = unpack_int4(stored) if kind == "int4_rs" else stored
        sc = take_kv_scales(scales, 2 * Hk).astype(jnp.float32)
        deq = (unp.astype(jnp.float32) * sc[..., None]).astype(jnp.bfloat16)
        deq = jnp.stack([deq[:, :Hk], deq[:, Hk:]], axis=2).reshape(
            -1, 2 * Hk, D).reshape(P, PS, 2 * Hk, D)
        ref = library_ref(q, deq, lens, pi)
        d = maxdiff(out, ref)
        say(f"rowscale[{kind}]: maxdiff vs dequant-library = {d:.5f} "
            f"{'OK' if d < 3e-2 else 'FAIL'}")


def _probe_rtt():
    f = jax.jit(lambda x: jnp.sum(x[:1, :1]).astype(jnp.float32))
    x = jnp.ones((4, 128))
    float(f(x))
    t = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t


def _timed(step, q0, n, rtt):
    """attn_tune methodology: donated chained jitted step (out feeds the
    next q), 1-element probe sync, RTT subtracted."""
    state = step(jnp.asarray(q0))
    float(jnp.sum(state.ravel()[:1]).astype(jnp.float32))
    t = time.perf_counter()
    for _ in range(n):
        state = step(state)
    float(jnp.sum(state.ravel()[:1]).astype(jnp.float32))
    return (time.perf_counter() - t - rtt) / n


# (lanes, chunk). v5 wants big chunks (op-issue amortization); chunk=16
# means Tc=1024 = one consume per ctx-1k lane (no intra-lane double buffer,
# relies on cross-lane prefetch), chunk=8 double-buffers within the lane.
_SWEEP_CFGS = [(2, 16), (4, 4), (4, 8), (4, 16), (8, 4), (8, 8), (8, 16),
               (16, 4)]


def _sweep_case(mode):
    """mode: 'int8' (dense pool, global scale) | 'int8_rs' | 'int4_rs'."""
    import functools as ft
    from nanovllm_tpu.ops.attention import quantize_kv
    B, ctx = 256, 1024
    P = 4200
    rtt = _probe_rtt()
    say(f"sweep[{mode}]: B={B} ctx={ctx} (decode bench shape) "
        f"RTT={rtt*1e3:.1f} ms")
    q, lens, pi = make_batch(B=B, ctx=ctx, P=P)
    q0 = np.asarray(q)   # pristine host copy: q is donated away per chain

    # library int8 baseline (the shipped engine decode path)
    pool8 = (make_pool(P, jnp.float32) / 0.0625).round().clip(-127, 127).astype(jnp.int8)

    @ft.partial(jax.jit, donate_argnums=(0,))
    def lib_step(qq, pool):
        return (library_ref(qq, pool, lens, pi, kv_scale=0.0625)
                * 1e-3).astype(qq.dtype)

    t_lib = _timed(lambda qq: lib_step(qq, pool8), q0, 20, rtt)
    say(f"sweep[{mode}]: library int8 (16,8): {t_lib*1e3:.3f} ms")

    if mode == "int8":
        pool, spool, kw = pool8, None, {"kv_scale": 0.0625}
    else:
        raw = jax.random.normal(jax.random.key(9), (P * PS, 2 * Hk, D),
                                jnp.float32)
        stored, scales = quantize_kv(raw, (mode, None))
        rh = Hk if mode == "int4_rs" else 2 * Hk
        pool = stored.reshape(P, PS, rh, D)
        spool = scales.reshape(P, PS, -1)
        kw = {"kv_mode": mode}

    for lanes, chunk in _SWEEP_CFGS:
        @ft.partial(jax.jit, donate_argnums=(0,))
        def fstep(qq, pool, sp, lanes=lanes, chunk=chunk):
            return (flash(qq, pool, lens, pi, kv_scales=sp,
                          chunk=chunk, lanes_per_step=lanes, **kw)
                    * 1e-3).astype(qq.dtype)
        try:
            t = _timed(lambda qq: fstep(qq, pool, spool), q0, 20, rtt)
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            say(f"sweep[{mode}]: lanes={lanes} chunk={chunk}: FAIL "
                f"{type(e).__name__}: {str(e).splitlines()[0][:90]}")
            continue
        say(f"sweep[{mode}]: flash lanes={lanes} chunk={chunk}: "
            f"{t*1e3:.3f} ms ({t/t_lib:.2f}x library-int8)")


def split(mode="int8", lanes=8, chunk=8):
    """Attribute kernel time: full vs DMA-only vs compute-only at the bench
    shape (decides whether the next optimization target is the copy stream
    or the MXU tile shapes)."""
    import functools as ft
    from nanovllm_tpu.ops.attention import quantize_kv
    B, ctx, P = 256, 1024, 4200
    rtt = _probe_rtt()
    say(f"split[{mode}]: B={B} ctx={ctx} lanes={lanes} chunk={chunk} "
        f"RTT={rtt*1e3:.1f} ms")
    q, lens, pi = make_batch(B=B, ctx=ctx, P=P)
    q0 = np.asarray(q)
    if mode == "int8":
        pool = (make_pool(P, jnp.float32) / 0.0625).round() \
            .clip(-127, 127).astype(jnp.int8)
        spool, kw = None, {"kv_scale": 0.0625}
    else:
        raw = jax.random.normal(jax.random.key(9), (P * PS, 2 * Hk, D),
                                jnp.float32)
        stored, scales = quantize_kv(raw, (mode, None))
        rh = Hk if mode == "int4_rs" else 2 * Hk
        pool = stored.reshape(P, PS, rh, D)
        spool = scales.reshape(P, PS, -1)
        kw = {"kv_mode": mode}
    for dbg in ("full", "dma", "compute"):
        @ft.partial(jax.jit, donate_argnums=(0,))
        def fstep(qq, pool, sp, dbg=dbg):
            return (flash(qq, pool, lens, pi, kv_scales=sp, chunk=chunk,
                          lanes_per_step=lanes, debug=dbg, **kw)
                    * 1e-3).astype(qq.dtype)
        try:
            t = _timed(lambda qq: fstep(qq, pool, spool), q0, 20, rtt)
            say(f"split[{mode}]: {dbg}: {t*1e3:.3f} ms")
        except Exception as e:  # noqa: BLE001
            say(f"split[{mode}]: {dbg}: FAIL {type(e).__name__}: "
                f"{str(e).splitlines()[0][:90]}")


def sweep():
    _sweep_case("int8")


def sweep_rs():
    _sweep_case("int8_rs")


def sweep4():
    _sweep_case("int4_rs")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    say(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    {"smoke": smoke, "parity": parity, "rowscale": rowscale,
     "sweep": sweep, "sweep_rs": sweep_rs, "sweep4": sweep4,
     "split": split}[stage]()
