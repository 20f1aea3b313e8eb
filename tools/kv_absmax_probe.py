"""Measure per-layer K/V row-absmax distributions through the real model.

Justifies (or refutes) the shipping int8 KV global scale
(config.kv_cache_scale = 1/16 covers |x| <= 7.9): Qwen3's per-head q/k
RMSNorm bounds K rows, but V rows are unnormalized — this probe prints,
per layer, the absmax percentiles of K and V rows so the clip risk is a
number instead of a docstring claim. Point NANOVLLM_TPU_MODEL at a real
checkpoint to turn the synthetic distribution into the real one.

Usage: timeout 300 python tools/kv_absmax_probe.py [seq_len]
"""

import sys

sys.path.insert(0, ".")
import nanovllm_tpu  # noqa: F401  (persistent cache setup)

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import Config
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.ops import layers as L
from nanovllm_tpu.utils.loader import load_params
from nanovllm_tpu.utils.model_path import get_model_path


def main(seq_len: int = 1024):
    path = get_model_path()
    cfg = Config(path, max_model_len=max(seq_len, 256))
    hf = cfg.hf_config
    params = load_params(path, hf, dtype=jnp.bfloat16)
    sc = qwen3.Qwen3StaticConfig.from_model_config(hf, attention_impl="xla")
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, hf.vocab_size, seq_len), jnp.int32)
    pos = jnp.arange(seq_len, dtype=jnp.int32)

    # re-run the per-layer computation exactly as the model does (dense
    # path), collecting k/v rows per layer
    Hq, Hk, D = (hf.num_attention_heads, hf.num_key_value_heads, hf.head_dim)
    h = L.embedding_lookup(params["embed_tokens"], ids)
    residual = None
    layers = params["layers"]
    Lcount = hf.num_hidden_layers
    print(f"model={path} layers={Lcount} seq={seq_len} "
          f"(K rows are q/k-RMSNormed, V rows are not)")
    print(f"{'layer':>5} {'K p50':>8} {'K p99':>8} {'K max':>8} "
          f"{'V p50':>8} {'V p99':>8} {'V max':>8} {'V>7.9%':>8}")
    stats = []
    for li in range(Lcount):
        lp = jax.tree.map(lambda a: a[li], layers)
        if residual is None:
            residual = h
            xn = L.rms_norm(h, lp["input_ln"], sc.rms_norm_eps)
        else:
            xn, residual = L.add_rms_norm(h, residual, lp["input_ln"],
                                          sc.rms_norm_eps)
        qkv = L.linear_apply(lp["qkv_proj"], xn, quant_cfg=None)
        q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hk) * D], axis=-1)
        k = k.reshape(seq_len, Hk, D)
        v = v.reshape(seq_len, Hk, D)
        k = L.rms_norm(k, lp["k_norm"], sc.rms_norm_eps)
        kmax = np.asarray(jnp.max(jnp.abs(k.astype(jnp.float32)), axis=-1))
        vmax = np.asarray(jnp.max(jnp.abs(v.astype(jnp.float32)), axis=-1))
        clip = float((vmax > 7.9375).mean() * 100)
        row = (li, *np.percentile(kmax, [50, 99]), kmax.max(),
               *np.percentile(vmax, [50, 99]), vmax.max(), clip)
        stats.append(row)
        print(f"{li:>5} {row[1]:>8.3f} {row[2]:>8.3f} {row[3]:>8.3f} "
              f"{row[4]:>8.3f} {row[5]:>8.3f} {row[6]:>8.3f} {clip:>7.2f}%")
        # advance the real forward so later layers see true inputs
        qf = L.rms_norm(q.reshape(seq_len, Hq, D), lp["q_norm"],
                        sc.rms_norm_eps)
        cos, sin = L.rope_cos_sin(pos, D, sc.rope_theta,
                                  scaling_factor=sc.rope_scaling_factor)
        qf = L.apply_rope(qf, cos, sin)
        kf = L.apply_rope(k, cos, sin)
        from nanovllm_tpu.ops import attention as attn_ops
        o = attn_ops.dense_attention(qf, kf, v.reshape(seq_len, Hk, D), pos,
                                     1.0 / (D ** 0.5))
        h = L.linear_apply(lp["o_proj"], o.reshape(seq_len, Hq * D),
                           quant_cfg=None)
        xn2, residual = L.add_rms_norm(h, residual, lp["post_ln"],
                                       sc.rms_norm_eps)
        gate_up = L.linear_apply(lp["gate_up_proj"], xn2, quant_cfg=None)
        h = L.linear_apply(lp["down_proj"], L.silu_and_mul(gate_up),
                           quant_cfg=None)
    worst_v = max(s[6] for s in stats)
    worst_clip = max(s[7] for s in stats)
    print(f"\nverdict: worst V-row absmax {worst_v:.2f} "
          f"(int8 global 1/16 clips at 7.94); "
          f"{worst_clip:.2f}% of V rows clip in the worst layer")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
