"""Checkpoint loading: HF safetensors → stacked functional param pytree.

Parity with the reference loader (reference: nanovllm/utils/loader.py:12-28 and
the packed_modules_mapping remap, nanovllm/models/qwen3.py:193-199): iterate
``*.safetensors``, remap q/k/v → merged qkv and gate/up → merged gate_up. The
reference streams tensors into per-module ``weight_loader``s; we instead build
the whole tree host-side in numpy (stacking the per-layer leaves on a leading L
axis for ``lax.scan``) and device_put once — sharding-aware placement happens
in the runner via NamedSharding.

Also provides ``save_params`` (writes a synthetic HF-layout checkpoint) used by
tests and benchmarks since this environment has no model hub access.
"""

import glob
import json
import os
import re

import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import ModelConfig


def _np_dtype(dtype):
    return {"bfloat16": jnp.bfloat16, "float32": np.float32, "float16": np.float16}[dtype]


def load_params(path: str, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Load an HF-layout checkpoint directory into the functional pytree."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(os.path.expanduser(path), "*.safetensors")))
    assert files, f"no *.safetensors under {path!r}"
    raw: dict[str, np.ndarray] = {}
    for file in files:
        # framework="np" gives zero-copy host views; bf16 loads as ml_dtypes.bfloat16
        with safe_open(file, framework="np") as f:
            for name in f.keys():
                raw[name] = f.get_tensor(name)
    return pack_params(raw, cfg, dtype)


def pack_params(raw: dict, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Pack flat HF-named tensors into the stacked-layer pytree."""
    L = cfg.num_hidden_layers
    D = cfg.head_dim
    Hq, Hk = cfg.num_attention_heads, cfg.num_key_value_heads

    def get(name):
        t = raw[name]
        return np.asarray(t)

    def linear_t(name):
        # HF stores [out, in]; we store [in, out]
        return get(name).T

    layers = {k: [] for k in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj",
                              "q_norm", "k_norm", "input_ln", "post_ln")}
    qkv_bias = []
    for i in range(L):
        p = f"model.layers.{i}."
        q = linear_t(p + "self_attn.q_proj.weight")
        k = linear_t(p + "self_attn.k_proj.weight")
        v = linear_t(p + "self_attn.v_proj.weight")
        layers["qkv_proj"].append(np.concatenate([q, k, v], axis=1))
        if f"{p}self_attn.q_proj.bias" in raw:  # Qwen2-family attention bias
            qkv_bias.append(np.concatenate([get(p + "self_attn.q_proj.bias"),
                                            get(p + "self_attn.k_proj.bias"),
                                            get(p + "self_attn.v_proj.bias")]))
        layers["o_proj"].append(linear_t(p + "self_attn.o_proj.weight"))
        gate = linear_t(p + "mlp.gate_proj.weight")
        up = linear_t(p + "mlp.up_proj.weight")
        layers["gate_up_proj"].append(np.concatenate([gate, up], axis=1))
        layers["down_proj"].append(linear_t(p + "mlp.down_proj.weight"))
        if f"{p}self_attn.q_norm.weight" in raw:
            layers["q_norm"].append(get(p + "self_attn.q_norm.weight"))
            layers["k_norm"].append(get(p + "self_attn.k_norm.weight"))
        else:
            layers["q_norm"].append(np.ones((D,), np.float32))
            layers["k_norm"].append(np.ones((D,), np.float32))
        layers["input_ln"].append(get(p + "input_layernorm.weight"))
        layers["post_ln"].append(get(p + "post_attention_layernorm.weight"))

    def stack(name, xs):
        return jnp.asarray(np.stack(xs), dtype=dtype)

    qkv = {"w": stack("qkv", layers["qkv_proj"])}
    if qkv_bias:
        qkv["b"] = stack("qkv_b", qkv_bias)
    params = {
        "embed_tokens": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype),
        "layers": {
            "qkv_proj": qkv,
            "o_proj": {"w": stack("o", layers["o_proj"])},
            "gate_up_proj": {"w": stack("gu", layers["gate_up_proj"])},
            "down_proj": {"w": stack("dn", layers["down_proj"])},
            "q_norm": stack("qn", layers["q_norm"]),
            "k_norm": stack("kn", layers["k_norm"]),
            "input_ln": stack("il", layers["input_ln"]),
            "post_ln": stack("pl", layers["post_ln"]),
        },
        "norm": jnp.asarray(get("model.norm.weight"), dtype=dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight"), dtype=dtype)
    return params


def save_synthetic_checkpoint(path: str, cfg: ModelConfig, seed: int = 0,
                              scale: float = 0.02):
    """Write a random HF-layout Qwen3 checkpoint (config.json + model.safetensors).

    Used for hermetic tests/benchmarks — weight values don't affect throughput,
    and numeric tests compare against HF transformers run on the same tensors.
    """
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    H, D, I, V, L = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size, cfg.vocab_size, cfg.num_hidden_layers
    Hq, Hk = cfg.num_attention_heads, cfg.num_key_value_heads
    tensors = {"model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32) * scale,
               "model.norm.weight": np.ones((H,), np.float32)}
    for i in range(L):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = rng.standard_normal((Hq * D, H)).astype(np.float32) * scale
        tensors[p + "self_attn.k_proj.weight"] = rng.standard_normal((Hk * D, H)).astype(np.float32) * scale
        tensors[p + "self_attn.v_proj.weight"] = rng.standard_normal((Hk * D, H)).astype(np.float32) * scale
        tensors[p + "self_attn.o_proj.weight"] = rng.standard_normal((H, Hq * D)).astype(np.float32) * scale
        tensors[p + "self_attn.q_norm.weight"] = np.ones((D,), np.float32)
        tensors[p + "self_attn.k_norm.weight"] = np.ones((D,), np.float32)
        tensors[p + "mlp.gate_proj.weight"] = rng.standard_normal((I, H)).astype(np.float32) * scale
        tensors[p + "mlp.up_proj.weight"] = rng.standard_normal((I, H)).astype(np.float32) * scale
        tensors[p + "mlp.down_proj.weight"] = rng.standard_normal((H, I)).astype(np.float32) * scale
        tensors[p + "input_layernorm.weight"] = np.ones((H,), np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones((H,), np.float32)
    if not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = rng.standard_normal((V, H)).astype(np.float32) * scale
    save_file(tensors, os.path.join(path, "model.safetensors"))
    cfg_dict = {k: (list(v) if isinstance(v, tuple) else v) for k, v in vars(cfg).items()}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)
