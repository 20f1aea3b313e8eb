"""Qwen3 (and Qwen2/Llama-family) decoder as pure JAX functions.

Capability parity with the reference model definition (reference:
nanovllm/models/qwen3.py:15-219) — merged QKV and gate/up projections, per-head
q/k RMSNorm (Qwen3), half-split RoPE, SiLU-gated MLP, fused residual-add
RMSNorm, tied or untied LM head — redesigned TPU-first:

- **params are a pytree** with per-layer weights stacked on a leading L axis,
  and the decoder loop is a ``lax.scan``: one trace/compile of the layer body
  regardless of depth, and XLA double-buffers layer weights through the loop.
- **no module classes**: linear layers are param dicts applied by
  ``ops.layers.linear_apply``, which also dispatches quantized variants; TP is
  sharding metadata on the arrays (parallel/sharding.py), not code.
- **attention metadata is an explicit argument** (AttnMeta/DenseMeta pytrees)
  instead of the reference's process-global Context (nanovllm/utils/context.py)
  — globals don't trace under jit.
- **one pooled KV-page buffer** rides the scan carry; each layer stores and
  attends at a page offset, so the donated cache updates in place.

Weight layout: all projection weights are stored transposed to [in, out] so
activations contract as ``x @ w`` on the MXU.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops.attention import AttnMeta, DenseMeta
from nanovllm_tpu.ops.layers import (
    add_rms_norm,
    apply_rope,
    embedding_lookup,
    linear_apply,
    rms_norm,
    rope_cos_sin,
    silu_and_mul,
)


class Qwen3StaticConfig(NamedTuple):
    """Hashable static model facts closed over by the jitted step functions."""

    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    hidden_size: int
    intermediate_size: int
    rms_norm_eps: float
    rope_theta: float
    tie_word_embeddings: bool
    qk_norm: bool                    # Qwen3 per-head q/k RMSNorm
    page_size: int = 64
    pages_per_layer: int = 0         # logical pages per layer in the pool
    attention_impl: str = "xla"      # ragged | xla
    store_interpret: bool = False    # interpret-mode store kernel (CPU tests)
    quant_cfg: tuple | None = None   # (quant_type, group_size, act_quant, dtype)
    # (num_kv_pages_per_block, num_queries_per_block) overrides for the ragged
    # kernel, per batch kind; None = library auto-tune table (which has no
    # entries for this GQA shape on v5e and falls back to bkv=128, bq=32)
    attn_blocks_prefill: tuple | None = None
    attn_blocks_decode: tuple | None = None
    # quantized KV storage: ("int8"|"fp8", dequant_scale) or None = model dtype
    kv_quant: tuple | None = None
    # linear rope scaling divisor (config.rope_scaling_factor; 1.0 = none)
    rope_scaling_factor: float = 1.0

    @staticmethod
    def from_model_config(cfg: ModelConfig, *, page_size=64, pages_per_layer=0,
                          attention_impl="xla", store_interpret=False,
                          quant_cfg=None, attn_blocks_prefill=None,
                          attn_blocks_decode=None, kv_quant=None):
        from nanovllm_tpu.config import rope_scaling_factor
        arch = cfg.architectures[0]
        return Qwen3StaticConfig(
            rope_scaling_factor=rope_scaling_factor(cfg),
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            rms_norm_eps=cfg.rms_norm_eps,
            rope_theta=cfg.rope_theta,
            tie_word_embeddings=cfg.tie_word_embeddings,
            qk_norm=(arch == "Qwen3ForCausalLM"),
            page_size=page_size,
            pages_per_layer=pages_per_layer,
            attention_impl=attention_impl,
            store_interpret=store_interpret,
            quant_cfg=quant_cfg,
            attn_blocks_prefill=attn_blocks_prefill,
            attn_blocks_decode=attn_blocks_decode,
            kv_quant=kv_quant,
        )


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> dict:
    """Random-init a full parameter pytree (synthetic checkpoints for tests and
    benchmarks; real checkpoints come through utils/loader.py)."""
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    D = cfg.head_dim
    Hq, Hk = cfg.num_attention_heads, cfg.num_key_value_heads
    I = cfg.intermediate_size
    V = cfg.vocab_size
    keys = iter(jax.random.split(key, 16))

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)

    params = {
        "embed_tokens": dense(next(keys), (V, H), H),
        "layers": {
            "qkv_proj": {"w": dense(next(keys), (L, H, (Hq + 2 * Hk) * D), H)},
            "o_proj": {"w": dense(next(keys), (L, Hq * D, H), Hq * D)},
            "gate_up_proj": {"w": dense(next(keys), (L, H, 2 * I), H)},
            "down_proj": {"w": dense(next(keys), (L, I, H), I)},
            "q_norm": jnp.ones((L, D), dtype),
            "k_norm": jnp.ones((L, D), dtype),
            "input_ln": jnp.ones((L, H), dtype),
            "post_ln": jnp.ones((L, H), dtype),
        },
        "norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(next(keys), (V, H), H)
    return params


def _attention_layer(layer_p, x, kv_pages, layer_idx, meta, sc: Qwen3StaticConfig):
    """One attention block over token stream x [T, H]; stores new K/V into the
    pooled page cache and attends against it."""
    T = x.shape[0]
    Hq, Hk, D = sc.num_heads, sc.num_kv_heads, sc.head_dim
    qcfg = sc.quant_cfg
    qkv = linear_apply(layer_p["qkv_proj"], x, quant_cfg=qcfg)
    q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hk) * D], axis=-1)
    q = q.reshape(T, Hq, D)
    k = k.reshape(T, Hk, D)
    v = v.reshape(T, Hk, D)
    if sc.qk_norm:
        # Per-head RMSNorm on q/k before RoPE (reference: qwen3.py:71-87)
        q = rms_norm(q, layer_p["q_norm"], sc.rms_norm_eps)
        k = rms_norm(k, layer_p["k_norm"], sc.rms_norm_eps)
    cos, sin = rope_cos_sin(meta.positions, D, sc.rope_theta,
                            scaling_factor=sc.rope_scaling_factor)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    scale = 1.0 / math.sqrt(D)
    if isinstance(meta, DenseMeta):
        o = attn_ops.dense_attention(q, k, v, meta.positions, scale)
    else:
        kv_new = attn_ops.combine_kv(k, v)
        if sc.kv_quant is not None:
            # quantize before the (dtype-agnostic) store DMA; XLA fuses this
            # into the preceding projections
            kv_new = attn_ops.quantize_kv(kv_new, sc.kv_quant)
        kv_pages = attn_ops.store_kv(
            kv_pages, kv_new, meta, layer_idx, page_size=sc.page_size,
            pages_per_layer=sc.pages_per_layer, interpret=sc.store_interpret)
        # decode-scan metas carry a length-1 (dummy) page-copy table — the
        # same static dispatch store_kv uses to pick its kernel
        is_decode = meta.store_page_src.shape[0] == 1
        blocks = sc.attn_blocks_decode if is_decode else sc.attn_blocks_prefill
        # row-scale pools route to the in-house quantized ragged kernel
        # inside paged_attention (prefill and decode both — the round-3
        # bf16 scratch-dequant prefill detour and its +24% tax are gone)
        o = attn_ops.paged_attention(
            q, kv_pages, meta, layer_idx, scale, impl=sc.attention_impl,
            page_size=sc.page_size, pages_per_layer=sc.pages_per_layer,
            blocks=blocks, kv_quant=sc.kv_quant,
            interpret=sc.store_interpret)
    out = linear_apply(layer_p["o_proj"], o.reshape(T, Hq * D), quant_cfg=qcfg)
    return out, kv_pages


def _mlp(layer_p, x, sc: Qwen3StaticConfig):
    gate_up = linear_apply(layer_p["gate_up_proj"], x, quant_cfg=sc.quant_cfg)
    return linear_apply(layer_p["down_proj"], silu_and_mul(gate_up), quant_cfg=sc.quant_cfg)


def forward(params: dict, input_ids, meta, kv_pages, sc: Qwen3StaticConfig):
    """Full decoder forward over a token stream.

    input_ids: i32[T]; kv_pages: [L*pages_per_layer, ps, 2Hk, D] (or a dummy
    for the dense path). Returns (hidden [T, H] after final norm, kv_pages).
    The layer loop is a ``lax.scan`` over stacked layer params; the pooled
    cache rides the carry so XLA updates the donated buffer in place.
    """
    x = embedding_lookup(params["embed_tokens"], input_ids)

    # The reference threads a None residual through the first layer
    # (qwen3.py:179-189); a zero residual in the scan carry is equivalent and
    # keeps every scan iteration uniform.
    residual = jnp.zeros_like(x)

    def layer_step(carry, layer_p):
        h, residual, kv_pages, l = carry
        normed, residual = add_rms_norm(h, residual, layer_p["input_ln"], sc.rms_norm_eps)
        attn_out, kv_pages = _attention_layer(layer_p, normed, kv_pages, l, meta, sc)
        normed, residual = add_rms_norm(attn_out, residual, layer_p["post_ln"], sc.rms_norm_eps)
        mlp_out = _mlp(layer_p, normed, sc)
        return (mlp_out, residual, kv_pages, l + 1), None

    (h, residual, kv_pages, _), _ = jax.lax.scan(
        layer_step, (x, residual, kv_pages, jnp.int32(0)), params["layers"])
    h = (h.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    h = rms_norm(h, params["norm"], sc.rms_norm_eps)
    return h, kv_pages


def dense_forward(params: dict, input_ids, positions, sc: Qwen3StaticConfig):
    """Cache-free teacher-forcing forward (model-as-library eval path; the
    reference's simple_attention=True mode, qwen3.py:65-70 + test_ppl.py:23).
    Returns hidden states [T, H] after the final norm."""
    dtype = params["embed_tokens"].dtype
    dummy = jnp.zeros((1, 1, 2 * sc.num_kv_heads, sc.head_dim), dtype)
    h, _ = forward(params, input_ids, DenseMeta(positions), dummy, sc)
    return h


def dense_forward_batch(params: dict, input_ids, sc: Qwen3StaticConfig):
    """Batched cache-free forward: [B, T] → [B, T, H] (vmap of dense_forward;
    the teacher-forcing eval path batches independent windows,
    cf. reference test_ppl.py:50-57 which feeds them one at a time)."""
    T = input_ids.shape[1]
    positions = jnp.arange(T, dtype=jnp.int32)
    return jax.vmap(lambda ids: dense_forward(params, ids, positions, sc))(input_ids)


def compute_logits(params: dict, hidden, sc: Qwen3StaticConfig):
    """LM head over selected hidden states [B, H] → [B, V] in fp32.

    (reference: nanovllm/layers/embed_head.py:44-66 — last-token narrowing is
    done by the caller via meta.last_token_idx.)"""
    w = params["embed_tokens"] if sc.tie_word_embeddings else params["lm_head"]
    # bf16 operands, fp32 accumulation/output: full MXU rate (a pre-cast fp32
    # matmul runs at 1/4+ rate on TPU for no accuracy the accumulator doesn't
    # already provide)
    return jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)


def select_last_tokens(hidden, meta):
    """Narrow hidden states to each sequence's last token
    (reference: nanovllm/layers/embed_head.py:57-60)."""
    return jnp.take(hidden, meta.last_token_idx, axis=0)
