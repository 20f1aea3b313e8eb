"""Quantization suite: INT8 / FP8-e4m3 at per-tensor, per-row, per-group scales.

Capability parity with the reference HW3 quantization payload (reference:
nanovllm/utils/quantization.py:13-524): three scale granularities x two low-bit
dtypes, each in "real" (stored low-bit) and "fake" (quant-dequant, stored bf16)
form, with dynamic per-row activation quantization making the per-row path a
true W8A8 GEMM. Differences by design:

- Weights live stacked [L, K, N] (K = in, N = out). "Per-row" in the reference
  is per *output channel* (its weights are [N, K]); here that is the N axis.
- Real quantized matmuls run on the MXU via XLA int8 dot
  (``preferred_element_type=int32``) with a scale-product epilogue — the
  XLA-native analogue of the reference's fused Triton W8A8 GEMM
  (quantization.py:54-144). A fused Pallas kernel (ops/pallas/quant_matmul.py)
  is selected when profitable for the weight-only per-group path, where pure
  XLA would materialize the dequantized weight in HBM.
- Quantized layers compose with tensor parallelism: scales shard with their
  weight dim (parallel/sharding.py). The reference asserts tp_size == 1
  (quantization.py:360,378,397).
- TPU note: fp8-e4m3 has no native MXU path on v5e; fp8 tensors are stored in
  fp8 (memory savings are real) and upcast to bf16 for the matmul, so fp8
  *quality* parity holds while int8 carries the throughput win.
"""

from functools import partial

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # float8_e4m3fn finite max
INT8_MAX = 127.0

_EPS = 1e-8

_BACKEND = None


def _on_tpu() -> bool:
    """Lazy backend check (import-time jax.default_backend() would initialize
    the backend before the engine wants to)."""
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = jax.default_backend()
    return _BACKEND == "tpu"


def _qmax(dtype) -> float:
    return INT8_MAX if dtype == jnp.int8 else FP8_MAX


def _cast_q(x, dtype):
    if dtype == jnp.int8:
        return jnp.clip(jnp.round(x), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return x.astype(dtype)


def storage_dtype(linear_dtype: str):
    return {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn, "bfloat16": jnp.bfloat16}[linear_dtype]


# --------------------------------------------------------------------- weights
def per_tensor_quant(w, dtype=jnp.int8):
    """w [..., K, N] → (w_q, scale[...]) one scale per trailing matrix
    (reference: quantization.py:166-191)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(-2, -1)), _EPS)
    scale = absmax / _qmax(dtype)
    w_q = _cast_q(w.astype(jnp.float32) / scale[..., None, None], dtype)
    return w_q, scale


def per_row_quant(w, dtype=jnp.int8):
    """w [..., K, N] → (w_q, scale[..., N]): per-output-channel scales
    (the reference's per-row over its [N, K] weights, quantization.py:147-163)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2), _EPS)
    scale = absmax / _qmax(dtype)
    w_q = _cast_q(w.astype(jnp.float32) / scale[..., None, :], dtype)
    return w_q, scale


def per_group_quant(w, group_size=128, dtype=jnp.int8):
    """w [..., K, N] → (w_q, scale[..., K/g, N]): groups along the contraction
    axis (reference: quantization.py:194-234)."""
    *lead, K, N = w.shape
    assert K % group_size == 0, (K, group_size)
    wg = w.astype(jnp.float32).reshape(*lead, K // group_size, group_size, N)
    absmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2), _EPS)
    scale = absmax / _qmax(dtype)
    w_q = _cast_q(wg / scale[..., None, :], dtype).reshape(*lead, K, N)
    return w_q, scale


# ----------------------------------------------------------------- activations
def quant_act_per_row(x, dtype=jnp.int8):
    """Dynamic per-token activation quant: x [T, K] → (x_q, scale [T])
    (reference Triton _per_row_quant_kernel, quantization.py:13-51)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), _EPS)
    scale = absmax / _qmax(dtype)
    x_q = _cast_q(x.astype(jnp.float32) / scale[:, None], dtype)
    return x_q, scale


# -------------------------------------------------------------------- matmuls
def w8a8_matmul(x_q, sx, w_q, sw, out_dtype=jnp.bfloat16):
    """Quantized GEMM with scale-product epilogue: the XLA analogue of the
    reference's fused Triton kernel (quantization.py:54-144).

    x_q [T, K], sx [T]; w_q [K, N], sw scalar | [N]; → [T, N].
    int8 accumulates in int32 on the MXU; fp8 upcasts to bf16 (no native fp8
    MXU on v5e) and accumulates in fp32.
    """
    if x_q.dtype == jnp.int8:
        if _on_tpu() and x_q.shape[0] >= 1024 and sw.ndim == 1:
            # prefill-shaped: the fused Pallas kernel keeps the int32
            # accumulator in VMEM and applies the scale product in its
            # epilogue — measured 249-260 vs 212 TOPS (63-66% vs 54% of the
            # int8 MXU peak) against this XLA formulation at M=8192 K=1024
            # N=4096. block_t=1024 is ~4% faster but overflows the 16 MB
            # scoped VMEM at K>=2048 shapes; 512 fits everywhere.
            from nanovllm_tpu.ops.pallas.quant_matmul import w8a8_matmul_pallas
            return w8a8_matmul_pallas(x_q, sx, w_q, sw,
                                      block_t=512, block_n=1024,
                                      block_k=1024, out_dtype=out_dtype)
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(
            x_q.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    scale = sx[:, None] * (sw[None, :] if sw.ndim else sw)
    return (acc * scale).astype(out_dtype)


def weight_only_matmul(x, w_q, scale, group_size=None, out_dtype=None):
    """Dequantize-and-matmul for weight-only schemes (reference
    per_tensor_matmul / per_group_matmul, quantization.py:237-307).

    scale: scalar (per-tensor), [N] (per-row used weight-only), or
    [K/g, N] (per-group). The per-group XLA path materializes the bf16
    weight; the fused Pallas kernel avoids that (see ops/pallas/quant_matmul).
    """
    out_dtype = out_dtype or x.dtype
    K, N = w_q.shape
    if scale.ndim == 2:  # per-group
        if _on_tpu():
            from nanovllm_tpu.ops.pallas.quant_matmul import group_dequant_matmul
            return group_dequant_matmul(x, w_q, scale, group_size=group_size,
                                        out_dtype=out_dtype)
        w = (w_q.astype(jnp.float32).reshape(K // group_size, group_size, N)
             * scale[:, None, :]).reshape(K, N)
        return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(out_dtype)
    if scale.ndim == 1:  # per-row: fold scale after the matmul
        acc = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
        return (acc * scale[None, :]).astype(out_dtype)
    acc = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (acc * scale).astype(out_dtype)


def quant_linear_apply(p: dict, x, quant_cfg):
    """Dispatch a quantized linear by param keys + static quant config.

    p: {"w_q": [K, N], "scale": ...}; quant_cfg: (type, group_size, act_quant,
    linear_dtype). Called from ops.layers.linear_apply under lax.scan, so all
    shapes are per-layer slices (leading L removed by scan).
    """
    quant_type, group_size, act_quant, linear_dtype = quant_cfg
    w_q, scale = p["w_q"], p["scale"]
    if quant_type == "per_row" and act_quant:
        if (w_q.dtype == jnp.int8 and scale.ndim == 1 and _on_tpu()
                and x.shape[0] >= 1024):
            # prefill-shaped: fully fused W8A8 — the dynamic activation
            # quant runs in the kernel prologue (per row per K block), so
            # the activation reads HBM once as bf16 instead of the separate
            # quant pass's read+write+read (reference's fused Triton W8A8,
            # quantization.py:54-144)
            from nanovllm_tpu.ops.pallas.quant_matmul import w8a8_matmul_act_fused
            return w8a8_matmul_act_fused(x, w_q, scale, out_dtype=x.dtype)
        # true W8A8, matching the reference's fused per-row path
        x_q, sx = quant_act_per_row(x, w_q.dtype)
        return w8a8_matmul(x_q, sx, w_q, scale, out_dtype=x.dtype)
    # per_tensor / per_group are weight-only in the reference
    # (quantization.py:237-307); keep that semantic for parity.
    return weight_only_matmul(x, w_q, scale, group_size, x.dtype)


# ------------------------------------------------------------------ fake quant
def fake_per_block_quant(w, blk_m=None, blk_n=None, dtype=jnp.int8):
    """Generalized block quant-dequant in bf16 (reference
    _fake_per_block_quant, quantization.py:404-431). Blocks tile (K, N); None
    means the whole axis."""
    *lead, K, N = w.shape
    bm = blk_m or K
    bn = blk_n or N
    assert K % bm == 0 and N % bn == 0
    wf = w.astype(jnp.float32).reshape(*lead, K // bm, bm, N // bn, bn)
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=(-3, -1), keepdims=True), _EPS)
    scale = absmax / _qmax(dtype)
    wq = _cast_q(wf / scale, dtype).astype(jnp.float32) * scale
    return wq.reshape(w.shape).astype(w.dtype)


def fake_per_tensor_quant(w, dtype=jnp.int8):
    return fake_per_block_quant(w, None, None, dtype)


def fake_per_row_quant(w, dtype=jnp.int8):
    return fake_per_block_quant(w, None, 1, dtype)


def fake_per_group_quant(w, group_size=128, dtype=jnp.int8):
    return fake_per_block_quant(w, group_size, 1, dtype)


def fake_cast(w, dtype="int8"):
    """Round-trip through the storage dtype (the reference's non-bf16
    linear_dtype mode, model_runner.py:44-47)."""
    if dtype == "bfloat16":
        return w
    if dtype == "fp8":
        return w.astype(jnp.float8_e4m3fn).astype(w.dtype)
    return fake_per_tensor_quant(w, jnp.int8)


# ------------------------------------------------------------- model rewrites
_LINEAR_SITES = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")


def apply_weight_quant(params: dict, quant_type: str, group_size: int,
                       linear_dtype: str) -> dict:
    """Swap the 4 projection sites per layer to real quantized storage
    (reference apply_per_row/tensor/group_quant, quantization.py:463-496);
    embed/lm_head stay bf16. Stacked [L, K, N] weights quantize vectorized."""
    dtype = storage_dtype(linear_dtype)
    assert dtype != jnp.bfloat16, "real quant requires int8/fp8 linear_dtype"
    params = dict(params)
    layers = dict(params["layers"])
    for site in _LINEAR_SITES:
        w = layers[site]["w"]
        if quant_type == "per_tensor":
            w_q, scale = per_tensor_quant(w, dtype)
        elif quant_type == "per_row":
            w_q, scale = per_row_quant(w, dtype)
        else:
            w_q, scale = per_group_quant(w, group_size, dtype)
        new = {"w_q": w_q, "scale": scale}
        if "b" in layers[site]:
            new["b"] = layers[site]["b"]  # Qwen2 QKV bias stays bf16
        layers[site] = new
    params["layers"] = layers
    return params


def apply_weight_fake_quant(params: dict, fn) -> dict:
    """Apply a fake-quant callable to the 4 weight sites, keeping bf16 storage
    (reference apply_weight_fake_quant, quantization.py:448-460)."""
    params = dict(params)
    layers = dict(params["layers"])
    for site in _LINEAR_SITES:
        new = {"w": fn(layers[site]["w"])}
        if "b" in layers[site]:
            new["b"] = layers[site]["b"]
        layers[site] = new
    params["layers"] = layers
    return params
