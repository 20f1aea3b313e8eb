"""Core layer ops as pure functions over param pytrees.

The reference implements these as torch ``nn.Module``s with ``torch.compile``
fusion (reference: nanovllm/layers/layernorm.py, rotary_embedding.py,
activation.py, sampler.py, linear.py). Here each op is a pure function under
``jax.jit`` — XLA fuses the elementwise chains into surrounding matmuls, which
subsumes the reference's per-module ``torch.compile`` decoration.

Linear layers are param dicts, not classes: ``{"w": [K, N]}`` for dense bf16,
or quantized variants produced by ``ops.quantization`` (``w_q``/``scale``/...).
``linear_apply`` dispatches on the keys present, so model code is agnostic to
the quantization scheme; tensor parallelism is expressed via sharding
annotations on the arrays (parallel/sharding.py), not via class hierarchy
(reference: nanovllm/layers/linear.py:12-153 has 5 TP linear classes — SPMD
sharding makes them one function).
"""

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-6):
    """RMSNorm with fp32 accumulation (reference: nanovllm/layers/layernorm.py:15-25)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def add_rms_norm(x, residual, weight, eps: float = 1e-6):
    """Fused residual-add + RMSNorm returning (normed, new_residual)
    (reference: nanovllm/layers/layernorm.py:27-40)."""
    residual = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(residual, weight, eps), residual


def rope_cos_sin(positions, head_dim: int, theta: float, dtype=jnp.float32,
                 scaling_factor: float = 1.0):
    """cos/sin tables for the given positions, half-split (non-interleaved) layout
    (reference: nanovllm/layers/rotary_embedding.py:18-35 precomputes a
    [max_pos, head_dim] cache; on TPU we compute on the fly — an outer product
    plus transcendentals fuses away, and avoids a 40k-row gather).
    ``scaling_factor`` > 1 is linear rope scaling: positions are divided by it
    (config.rope_scaling_factor; the reference rejects all scaling)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    pos = positions.astype(jnp.float32)
    if scaling_factor != 1.0:
        pos = pos * (1.0 / scaling_factor)
    freqs = pos[:, None] * inv_freq[None, :]  # [T, half]
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def apply_rope(x, cos, sin):
    """Rotate [T, H, D] by per-token cos/sin [T, D/2], half-split layout
    (reference: nanovllm/layers/rotary_embedding.py:8-15)."""
    dtype = x.dtype
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).astype(dtype)


def silu_and_mul(x):
    """silu(x1) * x2 over a 2-chunked last dim (reference: nanovllm/layers/activation.py:6-14)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(x1) * x2


def embedding_lookup(weight, input_ids):
    return jnp.take(weight, input_ids, axis=0)


def linear_apply(p: dict, x, *, quant_cfg=None):
    """Apply a linear layer given its param dict.

    Key layouts (N = out features, K = in features; weights stored [K, N] so
    activations contract naturally on the MXU):
      - ``{"w"}``:                              dense matmul
      - ``{"w_q", "scale"}`` scale [N]:         per-row (per-out-channel)
      - ``{"w_q", "scale"}`` scale scalar:      per-tensor
      - ``{"w_q", "scale"}`` scale [K/g, N]:    per-group along K
    plus an optional ``"b"`` bias [N] (Qwen2-family QKV projections;
    cf. reference linear.py:28-31 — under SPMD the partitioner places the add
    after the implicit row-parallel reduction, so no rank-0-only guard).
    Quantized dispatch lives in ops.quantization to keep this file dense-only.
    """
    if "w" in p:
        out = x @ p["w"]
    else:
        from nanovllm_tpu.ops import quantization as q
        out = q.quant_linear_apply(p, x, quant_cfg)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


_TOPK_CANDIDATES = 64  # fast-path candidate pool for the top-k/top-p path


def _pool_sample(scaled, Z, top_ks, top_ps, key, C):
    """Gumbel-max over the top-C candidates after top-k / nucleus masking.

    ``scaled`` is logits/T [B, V]; ``Z`` its logsumexp [B, 1] so nucleus
    probabilities are exact under the *full-vocab* softmax (a pool-local
    softmax would inflate them and shrink the kept set).
    """
    vals, idx = jax.lax.top_k(scaled, C)  # [B, C] desc
    rank = jnp.arange(C, dtype=jnp.int32)[None, :]
    k = jnp.where(top_ks > 0, jnp.minimum(top_ks, C), C)[:, None]
    probs = jnp.exp(vals - Z)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs  # mass strictly before
    # rank 0 always kept (a top_p of 0 still samples the argmax)
    keep = ((rank < k) & (cum_excl < top_ps[:, None])) | (rank == 0)
    masked = jnp.where(keep, vals, -jnp.inf)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(
        key, masked.shape, dtype=jnp.float32, minval=1e-10, maxval=1.0)))
    choice = jnp.argmax(masked + gumbel, axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]


def sample(logits, temperatures, key, top_ks=None, top_ps=None):
    """Greedy / temperature / top-k / top-p sampling.

    ``temperatures`` is [B]; 0.0 → argmax. The reference sampler is argmax-only
    despite accepting temperatures (reference: nanovllm/layers/sampler.py:5-12);
    we implement real Gumbel-max temperature sampling (degrading to greedy at
    temperature 0, matching reference eval behavior) plus optional per-sequence
    top-k / nucleus masks (an extension; compiled in only when the batch uses
    them — the caller passes None otherwise).

    top_ks i32[B] (0 = disabled), top_ps f32[B] (1.0 = disabled). Masks apply
    over a top-64 candidate pool on the fast path; when any row's nucleus
    spills past the pool (flat distribution) or requests top_k > 64, a
    ``lax.cond`` falls back to the exact full-vocab pool for that call.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temperatures[:, None], 1e-6)
    if top_ks is None:
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(
            key, logits.shape, dtype=jnp.float32, minval=1e-10, maxval=1.0)))
        noisy = jnp.argmax(logits / t + gumbel, axis=-1)
    else:
        V = logits.shape[-1]
        C = min(_TOPK_CANDIDATES, V)
        scaled = logits / t
        Z = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
        noisy = _pool_sample(scaled, Z, top_ks, top_ps, key, C)
        if C < V:
            pool_vals, _ = jax.lax.top_k(scaled, C)
            pool_mass = jnp.exp(pool_vals - Z).sum(-1)
            need_full = (((top_ps < 1.0) & (pool_mass < top_ps))
                         | (top_ks > C)) & (temperatures > 0.0)
            noisy = jax.lax.cond(
                jnp.any(need_full),
                lambda: _pool_sample(scaled, Z, top_ks, top_ps, key, V),
                lambda: noisy)
    return jnp.where(temperatures <= 0.0, greedy, noisy).astype(jnp.int32)
