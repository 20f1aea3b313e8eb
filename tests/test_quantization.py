"""Quantization numeric self-tests.

Port of the reference's in-file suite (reference:
nanovllm/utils/quantization.py:527-669): random bf16 matrices at several
(M, N, K), quantize → matmul → compare to the unquantized product, with the
same hard error thresholds (0.08 for the fused W8A8 per-row path, 0.1 for
per-tensor / per-group), plus fake-quant round-trip checks and a quantized
end-to-end engine run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nanovllm_tpu.ops import quantization as q

SHAPES = [(64, 128, 256), (128, 512, 384), (256, 256, 128)]


def _rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


def _rand(rng, m, n):
    return jnp.asarray(rng.standard_normal((m, n)), jnp.float32)


@pytest.mark.parametrize("M,K,N", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_w8a8_per_row_matmul(M, K, N, dtype):
    """Fused per-row W8A8 GEMM vs float reference (reference test_quant_mm,
    quantization.py:527-555, threshold 0.08)."""
    rng = np.random.default_rng(0)
    x = _rand(rng, M, K)
    w = _rand(rng, K, N)
    ref = x @ w
    w_q, sw = q.per_row_quant(w, dtype)
    x_q, sx = q.quant_act_per_row(x, dtype)
    out = q.w8a8_matmul(x_q, sx, w_q, sw, out_dtype=jnp.float32)
    assert _rel_err(out, ref) < 0.08


@pytest.mark.parametrize("M,K,N", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_per_tensor_weight_only(M, K, N, dtype):
    """(reference test_tensor_quant_mm, quantization.py:558-585, threshold 0.1)"""
    rng = np.random.default_rng(1)
    x = _rand(rng, M, K)
    w = _rand(rng, K, N)
    ref = x @ w
    w_q, scale = q.per_tensor_quant(w, dtype)
    out = q.weight_only_matmul(x, w_q, scale, out_dtype=jnp.float32)
    assert _rel_err(out, ref) < 0.1


@pytest.mark.parametrize("group_size", [64, 128])
@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_per_group_weight_only(group_size, dtype):
    """(reference test_group_quant_mm, quantization.py:588-619, threshold 0.1)"""
    rng = np.random.default_rng(2)
    M, K, N = 128, 512, 256
    x = _rand(rng, M, K)
    w = _rand(rng, K, N)
    ref = x @ w
    w_q, scale = q.per_group_quant(w, group_size, dtype)
    out = q.weight_only_matmul(x, w_q, scale, group_size=group_size,
                               out_dtype=jnp.float32)
    assert _rel_err(out, ref) < 0.1


def test_group_quant_tighter_than_tensor():
    """Finer scale granularity must reduce quantization error."""
    rng = np.random.default_rng(3)
    w = _rand(rng, 512, 256) * jnp.asarray(
        np.exp(rng.standard_normal(256)), jnp.float32)  # per-channel spread
    wt_q, st = q.per_tensor_quant(w, jnp.int8)
    wg_q, sg = q.per_group_quant(w, 64, jnp.int8)
    deq_t = wt_q.astype(jnp.float32) * st
    deq_g = (wg_q.astype(jnp.float32).reshape(8, 64, 256) * sg[:, None, :]).reshape(512, 256)
    err_t = float(jnp.mean(jnp.abs(deq_t - w)))
    err_g = float(jnp.mean(jnp.abs(deq_g - w)))
    assert err_g < err_t


@pytest.mark.parametrize("fn", [
    q.fake_per_tensor_quant,
    q.fake_per_row_quant,
    lambda w: q.fake_per_group_quant(w, 64),
])
def test_fake_quant_roundtrip_close(fn):
    """Fake quant keeps dtype/shape and bounded error (reference
    test_fake_quant, quantization.py:622-654)."""
    rng = np.random.default_rng(4)
    w = _rand(rng, 128, 256)
    wq = fn(w)
    assert wq.shape == w.shape and wq.dtype == w.dtype
    assert _rel_err(wq, w) < 0.05


def test_stacked_layer_quant_shapes(tiny_config):
    """apply_weight_quant on the stacked [L, K, N] model weights."""
    from nanovllm_tpu.models import qwen3
    params = qwen3.init_params(tiny_config, jax.random.key(0), dtype=jnp.float32)
    for qt, expect in [("per_tensor", 1), ("per_row", 2), ("per_group", 3)]:
        p = q.apply_weight_quant(params, qt, 32, "int8")
        site = p["layers"]["qkv_proj"]
        assert site["w_q"].dtype == jnp.int8
        assert site["scale"].ndim == expect
        assert "w" not in site


@pytest.mark.parametrize("quant_type", ["per_tensor", "per_row", "per_group"])
def test_quantized_engine_generates(tiny_checkpoint, quant_type, rng):
    """Quantized engine runs end-to-end and stays close to bf16 greedy
    output (tiny random models quantize noisily; require the engine to run
    and produce valid tokens, and identical greedy output across runs)."""
    from nanovllm_tpu import LLM, SamplingParams
    llm = LLM(tiny_checkpoint, max_model_len=128, max_num_batched_tokens=256,
              max_num_seqs=4, kvcache_block_size=8, num_kvcache_blocks=64,
              attention_impl="xla", quant_type=quant_type, group_size=16,
              linear_dtype="int8")
    prompt = rng.integers(0, 512, size=12).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out1 = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    out2 = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    assert len(out1) == 8 and out1 == out2
    assert all(0 <= t < 512 for t in out1)


@pytest.mark.parametrize("T,K,N,bt,bn,bk", [
    (256, 256, 512, 128, 256, 128),   # divisible everywhere
    (100, 200, 150, 64, 128, 128),    # padding on every axis
    (1024, 192, 136, 512, 1024, 1024),  # serving-path blocks, ragged N/K
])
def test_pallas_w8a8_matmul_interpret(T, K, N, bt, bn, bk):
    """The fused Pallas W8A8 kernel (interpret mode on CPU) matches the XLA
    int8-dot + scale-epilogue formulation, including non-divisible T/N/K
    (zero-padding correctness)."""
    from nanovllm_tpu.ops.pallas.quant_matmul import w8a8_matmul_pallas
    rng = np.random.default_rng(6)
    x = _rand(rng, T, K)
    w = _rand(rng, K, N)
    w_q, sw = q.per_row_quant(w, jnp.int8)
    x_q, sx = q.quant_act_per_row(x, jnp.int8)
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32).astype(jnp.float32)
    want = acc * (sx[:, None] * sw[None, :])
    got = w8a8_matmul_pallas(x_q, sx, w_q, sw, block_t=bt, block_n=bn,
                             block_k=bk, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    assert _rel_err(got, x @ w) < 0.08


@pytest.mark.parametrize("T,K,N,bt,bn,bk", [
    (256, 512, 384, 128, 8192, 128),   # bn clamps to N, multiple K blocks
    (100, 200, 150, 64, 128, 128),     # padding on every axis
])
def test_pallas_w8a8_act_fused_interpret(T, K, N, bt, bn, bk):
    """The act-quant-fused W8A8 kernel (interpret mode) matches an XLA
    formulation of the same per-row-per-K-block quantization exactly, and
    the float reference within the reference suite's 0.08 gate."""
    from nanovllm_tpu.ops.pallas.quant_matmul import w8a8_matmul_act_fused
    rng = np.random.default_rng(7)
    x = _rand(rng, T, K)
    w = _rand(rng, K, N)
    w_q, sw = q.per_row_quant(w, jnp.int8)
    got = w8a8_matmul_act_fused(x, w_q, sw, block_t=bt, block_n=bn,
                                block_k=bk, out_dtype=jnp.float32,
                                interpret=True)
    # XLA oracle with the kernel's exact quantization grouping
    Kp = (K + bk - 1) // bk * bk
    xp = np.zeros((T, Kp), np.float32)
    xp[:, :K] = np.asarray(x)
    wqp = np.zeros((Kp, N), np.int8)
    wqp[:K] = np.asarray(w_q)
    want = np.zeros((T, N), np.float32)
    for k0 in range(0, Kp, bk):
        blk = xp[:, k0:k0 + bk]
        absmax = np.maximum(np.abs(blk).max(1, keepdims=True), 1e-8)
        x_q = np.clip(np.round(blk * (127.0 / absmax)), -127, 127)
        want += (x_q @ wqp[k0:k0 + bk].astype(np.float32)) * (absmax / 127.0)
    want *= np.asarray(sw)[None, :]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)
    assert _rel_err(got, x @ w) < 0.08


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
@pytest.mark.parametrize("T,N,K,g", [(48, 384, 256, 64), (128, 512, 512, 128)])
def test_pallas_group_dequant_matmul_interpret(T, N, K, g, dtype):
    """The fused Pallas per-group kernel (interpret mode on CPU) matches the
    XLA dequant-matmul formulation."""
    from nanovllm_tpu.ops.pallas.quant_matmul import group_dequant_matmul
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    w_q, scale = q.per_group_quant(w, g, dtype)
    want = q.weight_only_matmul(x, w_q, scale, g, jnp.float32)
    got = group_dequant_matmul(x, w_q, scale, group_size=g,
                               out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    assert _rel_err(got, x @ w) < 0.1
