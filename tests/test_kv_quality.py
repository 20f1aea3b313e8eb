"""KV-cache dtype quality gates (round-4, VERDICT item 5).

The weight-quant fake-vs-real PPL grid (test_harness.py) runs the cache-free
model-as-library path and never touches the KV cache; these tests push a
sequence through the REAL paged prefill machinery (store -> quantized pool
-> attention) per kv_cache_dtype and gate the logit KL divergence vs the
bf16-KV engine, so the shipping int8 global-scale config's quality is
finally gated — including a constructed V-row-magnitude hazard where the
fixed global scale clips (the failure class the per-row-scale formats exist
for)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine import meta_pack
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.sampling_params import SamplingParams


def _engine_logits(ckpt, kv_dtype, token_ids, v_gain=1.0, kv_scale=0.0625):
    """Per-position next-token logits of one sequence through the paged
    prefill path (store -> quantized pool -> attention).

    v_gain scales v_proj's weights to emulate models whose V rows carry
    large magnitudes (V is unnormalized in the served models; q/k are
    RMSNormed). On the tiny synthetic model PPL is ~vocab-size regardless
    (near-uniform predictions), so the quality gates below compare KL
    divergence against the bf16-KV engine's own distribution instead."""
    cfg = Config(ckpt, max_model_len=256, max_num_batched_tokens=512,
                 max_num_seqs=4, kvcache_block_size=8, num_kvcache_blocks=96,
                 prefill_token_buckets=(128, 256, 512),
                 attention_impl="xla", kv_cache_dtype=kv_dtype,
                 kv_cache_scale=kv_scale)
    mr = ModelRunner(cfg)
    if v_gain != 1.0:
        # layers are scan-stacked: qkv w is [L, H, (Hq+2Hk)*D] packed q|k|v
        hf = cfg.hf_config
        qk = (hf.num_attention_heads + hf.num_key_value_heads) * hf.head_dim
        w = mr.params["layers"]["qkv_proj"]["w"]
        mr.params["layers"]["qkv_proj"]["w"] = w.at[:, :, qk:].mul(v_gain)
    seq = Sequence(list(token_ids), SamplingParams(max_tokens=1),
                   block_size=cfg.kvcache_block_size)
    seq.block_table = list(range((len(seq) + 7) // 8))
    buf, fbuf, T = mr.prepare([seq], True)
    v, _ = meta_pack.split_prefill_i32(buf, mr.pack_layout)
    from nanovllm_tpu.ops.attention import AttnMeta
    meta = AttnMeta(
        positions=jnp.asarray(v["positions"]),
        q_segment_ids=jnp.asarray(v["q_segment_ids"]),
        kv_lens=jnp.asarray(v["kv_lens"]),
        page_indices=jnp.asarray(v["page_indices"]),
        cu_q_lens=jnp.asarray(v["cu_q_lens"]),
        num_seqs=jnp.asarray(v["num_seqs"]),
        last_token_idx=jnp.asarray(v["last_token_idx"]),
        temperatures=jnp.zeros(cfg.max_num_seqs, jnp.float32),
        slot_ids=jnp.asarray(v["slot_ids"]),
        top_ks=jnp.asarray(v["top_ks"]),
        top_ps=jnp.ones(cfg.max_num_seqs, jnp.float32),
        store_page_src=jnp.asarray(v["store_page_src"]),
        store_page_dst=jnp.asarray(v["store_page_dst"]),
        store_row_src=jnp.asarray(v["store_row_src"]),
        store_row_dst_page=jnp.asarray(v["store_row_dst_page"]),
        store_row_dst_pos=jnp.asarray(v["store_row_dst_pos"]),
        store_counts=jnp.asarray(v["store_counts"]))
    h, _ = qwen3.forward(mr.params, jnp.asarray(v["input_ids"]), meta,
                         mr.kv_pages, mr.sc)
    logits = qwen3.compute_logits(mr.params, h, mr.sc).astype(jnp.float32)
    return np.asarray(logits[: len(token_ids) - 1])


def _kl(base_logits, q_logits):
    """Mean KL(base || q) over positions, in nats."""
    lp = jax.nn.log_softmax(jnp.asarray(base_logits), axis=-1)
    lq = jax.nn.log_softmax(jnp.asarray(q_logits), axis=-1)
    return float(jnp.mean(jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)))


@pytest.fixture(scope="module")
def text(rng_module=None):
    return np.random.default_rng(5).integers(0, 512, size=96).tolist()


def test_kv_dtype_logits_track_bf16(tiny_checkpoint, text):
    """Per-KV-dtype logit KL vs the bf16 cache, realistic magnitudes: the
    shipping int8 global-scale config and the rs formats must all track
    bf16-KV closely; int4's 15-level nibble is looser."""
    base = _engine_logits(tiny_checkpoint, "auto", text)
    for d, bound in (("int8", 0.01), ("fp8", 0.01), ("int8_rs", 0.01),
                     ("int4", 0.05)):
        kl = _kl(base, _engine_logits(tiny_checkpoint, d, text))
        assert kl < bound, (d, kl)


def test_int8_global_scale_clips_large_v(tiny_checkpoint, text):
    """THE V-clipping hazard gate: with V magnitudes pushed past the fixed
    global scale's ±7.9 range, plain int8 KV diverges measurably from the
    bf16-KV engine while the per-row-scale format stays at its quality.
    This is the failure class VERDICT r3 flagged as unguarded in the
    shipping config."""
    gain = 100.0   # tiny model V rows ~0.16 -> ~16, 2x past the clip point
    base = _engine_logits(tiny_checkpoint, "auto", text, v_gain=gain)
    kl_clip = _kl(base, _engine_logits(tiny_checkpoint, "int8", text,
                                       v_gain=gain))
    kl_rs = _kl(base, _engine_logits(tiny_checkpoint, "int8_rs", text,
                                     v_gain=gain))
    # rs adapts per row: stays at the no-hazard quality level
    assert kl_rs < 0.01, kl_rs
    # the fixed global scale saturates: divergence must be an order above
    # the rs format (the canary for the hazard class)
    assert kl_clip > 10 * max(kl_rs, 1e-4), (kl_clip, kl_rs)


def test_int8_wider_global_scale_recovers(tiny_checkpoint, text):
    """The same hazard disappears when kv_cache_scale widens to cover the
    actual V range — evidence that scale calibration (not format change)
    is one valid mitigation, at the cost of K resolution."""
    gain = 100.0
    base = _engine_logits(tiny_checkpoint, "auto", text, v_gain=gain)
    wide = _engine_logits(tiny_checkpoint, "int8", text, v_gain=gain,
                          kv_scale=0.25)
    assert _kl(base, wide) < 0.02, _kl(base, wide)
