"""Probe: per-op costs of the flash_decode v6 compute building blocks on the
real chip — lane-stretch candidates for per-(row, head) KV scales, the
all-pairs int8/bf16 matmuls, rolls, transposes, elementwise passes.

Methodology: each candidate op runs REPS times inside ONE kernel via
lax.fori_loop (so op cost dominates), and the tunnel RTT + launch cost is
subtracted via a null kernel timed with the same harness. Times are min of
3 runs. All shapes are the serving decode shape (Hq=16, D=128, Tc=1024
rows/chunk, hdim=8 -> N=8192 all-pairs columns).

Usage: timeout 500 python tools/stretch_probe.py [case ...]
"""

import sys
import time

sys.path.insert(0, ".")
import nanovllm_tpu

nanovllm_tpu.enable_persistent_jit_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Hq, Hk, D = 16, 8, 128
Tc = 1024
HDIM = 8                      # int4 pool slot count
N = Tc * HDIM
REPS = 2048


def say(m):
    print(m, flush=True)


def _min_time(f, *args, n=3):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]   # force completion
    best = float("inf")
    for _ in range(n):
        t = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t)
    return best


_NULL = None


def _null_time():
    global _NULL
    if _NULL is None:
        def nullk(x_ref, o_ref):
            o_ref[:] = x_ref[:]
        f = jax.jit(lambda x: pl.pallas_call(
            nullk, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x))
        _NULL = _min_time(f, jnp.ones((8, 128), jnp.float32))
    return _NULL


def _report(name, body, out_sd, *inputs):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            body, out_shape=out_sd,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20))(*a))
        dt = _min_time(f, *inputs) - _null_time()
        say(f"{name}: {dt/REPS*1e6:.3f} us/op")
    except Exception as e:  # noqa: BLE001 - probe survives unsupported ops
        lines = str(e).splitlines()
        msg = next((ln for ln in lines if "unsupported" in ln.lower()
                    or "error" in ln.lower()), lines[0] if lines else "")
        say(f"{name}: FAIL {type(e).__name__}: {msg[:140]}")


def _loop(init, step):
    """fori_loop wrapper: step must be shape-stable."""
    return jax.lax.fori_loop(0, REPS, step, init)


def case_take():
    def k(x_ref, o_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) // HDIM)[0]
        o_ref[:] = _loop(jnp.zeros((Hq, N), jnp.float32),
                         lambda i, a: a + jnp.take(x_ref[:] + i, idx, axis=1))
    _report("take(lane-gather)", k,
            jax.ShapeDtypeStruct((Hq, N), jnp.float32),
            jnp.ones((Hq, Tc), jnp.float32))


def case_bcmerge():
    def k(x_ref, o_ref):
        def step(i, a):
            z = (x_ref[:] + i)[:, None, :]            # [Tc, 1, Hq]
            z = jnp.broadcast_to(z, (Tc, HDIM, Hq)).reshape(N, Hq)
            return a + jax.lax.transpose(z, (1, 0))
        o_ref[:] = _loop(jnp.zeros((Hq, N), jnp.float32), step)
    _report("bcmerge+bigT", k, jax.ShapeDtypeStruct((Hq, N), jnp.float32),
            jnp.ones((Tc, Hq), jnp.float32))


def case_bcmerge_noT():
    def k(x_ref, o_ref):
        def step(i, a):
            z = (x_ref[:] + i)[:, None, :]
            return a + jnp.broadcast_to(z, (Tc, HDIM, Hq)).reshape(N, Hq)
        o_ref[:] = _loop(jnp.zeros((N, Hq), jnp.float32), step)
    _report("bcmerge(noT)", k, jax.ShapeDtypeStruct((N, Hq), jnp.float32),
            jnp.ones((Tc, Hq), jnp.float32))


def case_transpose():
    def k(x_ref, o_ref):
        o_ref[:] = _loop(
            jnp.zeros((N, Hq), jnp.float32),
            lambda i, a: a + jax.lax.transpose(x_ref[:] + i, (1, 0)))
    _report("bigT [Hq,N]->[N,Hq]", k,
            jax.ShapeDtypeStruct((N, Hq), jnp.float32),
            jnp.ones((Hq, N), jnp.float32))


def case_roll():
    def k(x_ref, o_ref):
        o_ref[:] = _loop(jnp.zeros((Hq, N), jnp.float32),
                         lambda i, a: a + pltpu.roll(x_ref[:] + i, Hk, 1))
    _report("roll [Hq,N] by Hk", k,
            jax.ShapeDtypeStruct((Hq, N), jnp.float32),
            jnp.ones((Hq, N), jnp.float32))


def case_elementwise():
    def k(x_ref, o_ref):
        o_ref[:] = _loop(jnp.zeros((Hq, N), jnp.float32),
                         lambda i, a: a + jnp.exp(x_ref[:] * (1.0 / (1 + i))))
    _report("exp pass [Hq,N]", k,
            jax.ShapeDtypeStruct((Hq, N), jnp.float32),
            jnp.full((Hq, N), -1.0, jnp.float32))


def case_score_i8_nt():
    def k(q_ref, r_ref, o_ref):
        o_ref[:] = _loop(
            jnp.zeros((Hq, N), jnp.int32),
            lambda i, a: a + jax.lax.dot_general(
                q_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32))
    _report("score i8 NT [Hq,D]x[N,D]", k,
            jax.ShapeDtypeStruct((Hq, N), jnp.int32),
            jnp.ones((Hq, D), jnp.int8), jnp.ones((N, D), jnp.int8))


def case_score_bf16_nt():
    def k(q_ref, r_ref, o_ref):
        o_ref[:] = _loop(
            jnp.zeros((Hq, N), jnp.float32),
            lambda i, a: a + jax.lax.dot_general(
                q_ref[:], (r_ref[:] + i).astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
    _report("score bf16 NT (incl i8->bf16 cast)", k,
            jax.ShapeDtypeStruct((Hq, N), jnp.float32),
            jnp.ones((Hq, D), jnp.bfloat16), jnp.ones((N, D), jnp.int8))


def case_pv_i8_nn():
    def k(p_ref, r_ref, o_ref):
        o_ref[:] = _loop(
            jnp.zeros((Hq, D), jnp.int32),
            lambda i, a: a + jax.lax.dot_general(
                p_ref[:], r_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
    _report("pv i8 NN [Hq,N]x[N,D]", k,
            jax.ShapeDtypeStruct((Hq, D), jnp.int32),
            jnp.ones((Hq, N), jnp.int8), jnp.ones((N, D), jnp.int8))


def case_pv_bf16_nn():
    def k(p_ref, r_ref, o_ref):
        o_ref[:] = _loop(
            jnp.zeros((Hq, D), jnp.float32),
            lambda i, a: a + jax.lax.dot_general(
                (p_ref[:] + i).astype(jnp.bfloat16),
                r_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    _report("pv bf16 NN (incl casts)", k,
            jax.ShapeDtypeStruct((Hq, D), jnp.float32),
            jnp.ones((Hq, N), jnp.float32), jnp.ones((N, D), jnp.int8))


def case_quant_p():
    def k(p_ref, o_ref):
        def step(i, a):
            p = p_ref[:] * (1.0 / (1 + i))
            pmax = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-30)
            pq = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
            return a + pq.astype(jnp.int32)
        o_ref[:] = _loop(jnp.zeros((Hq, N), jnp.int32), step)
    _report("p rowmax+quant->i8 [Hq,N]", k,
            jax.ShapeDtypeStruct((Hq, N), jnp.int32),
            jnp.ones((Hq, N), jnp.float32))


def case_perhead_v5():
    """v5-style per-head compute for one chunk (reference point): 8 heads x
    (2 bf16 matmuls at [G, Tc] + small softmax ops)."""
    G = Hq // Hk

    def k(q_ref, r_ref, o_ref):
        def step(i, a):
            out = a
            for h in range(Hk):
                qh = q_ref[h * G:(h + 1) * G]            # [G, D]
                kh = (r_ref[pl.ds(h * Tc, Tc)] + 0).astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = jnp.exp(s * 1e-2).astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    p, kh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = out + jnp.pad(pv, ((h * G, Hq - (h + 1) * G), (0, 0)))
            return out
        o_ref[:] = _loop(jnp.zeros((Hq, D), jnp.float32), step)
    _report("v5-ish per-head chunk (8 heads, bf16)", k,
            jax.ShapeDtypeStruct((Hq, D), jnp.float32),
            jnp.ones((Hq, D), jnp.bfloat16), jnp.ones((Hk * Tc, D), jnp.int8))


CASES = {
    "take": case_take, "bcmerge": case_bcmerge,
    "bcmerge_noT": case_bcmerge_noT, "transpose": case_transpose,
    "roll": case_roll, "elementwise": case_elementwise,
    "score_i8_nt": case_score_i8_nt, "score_bf16_nt": case_score_bf16_nt,
    "pv_i8_nn": case_pv_i8_nn, "pv_bf16_nn": case_pv_bf16_nn,
    "quant_p": case_quant_p, "perhead_v5": case_perhead_v5,
}


def case_take2():
    """Lane-gather variants: take_along_axis and one-hot-free forms."""
    def k1(x_ref, o_ref):
        def step(i, a):
            idx = jax.lax.broadcasted_iota(jnp.int32, (Hq, N), 1) // HDIM
            return a + jnp.take_along_axis(x_ref[:] + i, idx, axis=1)
        o_ref[:] = _loop(jnp.zeros((Hq, N), jnp.float32), step)
    _report("take_along_axis [Hq,Tc]->[Hq,N]", k1,
            jax.ShapeDtypeStruct((Hq, N), jnp.float32),
            jnp.ones((Hq, Tc), jnp.float32))

    def k2(x_ref, o_ref):
        def step(i, a):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (8, N), 1) // HDIM)
            g = jnp.take_along_axis(
                jnp.broadcast_to(x_ref[0:1] + i, (8, Tc)), idx, axis=1)
            return a + g[0:1]
        o_ref[:] = _loop(jnp.zeros((1, N), jnp.float32), step)
    _report("take_along_axis [1->8,Tc]->[8,N]", k2,
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jnp.ones((Hq, Tc), jnp.float32))


CASES["take2"] = case_take2


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    say(f"backend: {jax.default_backend()}  null={_null_time()*1e3:.1f} ms")
    for n in names:
        CASES[n]()
