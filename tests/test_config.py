"""Config-time validation: bad knob combinations must fail at Config(), not
as silent regressions or bare asserts at first device dispatch."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.config import Config, ModelConfig, rope_scaling_factor


def _mc(**kw):
    base = dict(num_hidden_layers=2, hidden_size=64, vocab_size=256,
                num_attention_heads=4, num_key_value_heads=2, head_dim=128)
    base.update(kw)
    return dataclasses.replace(ModelConfig(), **base)


def test_attention_impl_validated():
    Config(hf_config=_mc(), attention_impl="xla")  # ok
    with pytest.raises(ValueError, match="attention_impl"):
        Config(hf_config=_mc(), attention_impl="fhlash")


def test_flash_impl_accepted():
    cfg = Config(hf_config=_mc(), attention_impl="flash")
    assert cfg.attention_impl == "flash"


def test_rs_kv_requires_head_dim_128():
    # the flash-decode kernel (any non-oracle impl) requires D=128 for rs
    with pytest.raises(ValueError, match="head_dim 128"):
        Config(hf_config=_mc(head_dim=64), attention_impl="ragged",
               kv_cache_dtype="int8_rs")
    # the XLA oracle path (tests) is head_dim-generic
    Config(hf_config=_mc(head_dim=64), attention_impl="xla",
           kv_cache_dtype="int8_rs")
    # plain int8 KV has no head_dim restriction
    Config(hf_config=_mc(head_dim=64), attention_impl="ragged",
           kv_cache_dtype="int8")


def test_rs_kv_tensor_parallel_composes():
    # rs pools shard on the head axis since round 5 — tp must divide Hk
    cfg = Config(hf_config=_mc(), attention_impl="xla",
                 kv_cache_dtype="int4", tensor_parallel_size=2)
    assert cfg.tensor_parallel_size == 2
    with pytest.raises(ValueError, match="num_key_value_heads"):
        Config(hf_config=_mc(num_key_value_heads=2), attention_impl="xla",
               kv_cache_dtype="int4", tensor_parallel_size=4)


def test_rope_scaling_unsupported_type_fails_loudly():
    mc = _mc(rope_scaling={"rope_type": "yarn", "factor": 4.0})
    with pytest.raises(ValueError, match="rope_scaling"):
        Config(hf_config=mc, attention_impl="xla")


def test_rope_scaling_linear_resolves_and_applies():
    mc = _mc(rope_scaling={"rope_type": "linear", "factor": 4.0})
    assert rope_scaling_factor(mc) == 4.0
    assert rope_scaling_factor(_mc()) == 1.0
    # legacy "type" key (older HF configs)
    assert rope_scaling_factor(
        _mc(rope_scaling={"type": "linear", "factor": 2.0})) == 2.0

    from nanovllm_tpu.ops.layers import rope_cos_sin
    pos = jnp.asarray([0, 4, 8], jnp.int32)
    c4, s4 = rope_cos_sin(pos, 128, 10000.0, scaling_factor=4.0)
    c1, s1 = rope_cos_sin(pos // 4, 128, 10000.0)
    np.testing.assert_allclose(np.asarray(c4), np.asarray(c1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s4), np.asarray(s1), rtol=1e-6)


def test_rope_scaling_read_from_config_json(tmp_path):
    import json
    d = tmp_path / "ckpt"
    d.mkdir()
    raw = {"architectures": ["Qwen3ForCausalLM"], "hidden_size": 64,
           "num_attention_heads": 4, "num_key_value_heads": 2,
           "num_hidden_layers": 2, "head_dim": 128, "vocab_size": 256,
           "rope_scaling": {"rope_type": "dynamic", "factor": 8.0}}
    (d / "config.json").write_text(json.dumps(raw))
    with pytest.raises(ValueError, match="rope_scaling"):
        Config(model=str(d), attention_impl="xla")


def test_rope_scaled_model_forward_differs_from_unscaled(tiny_checkpoint,
                                                         tiny_config):
    """A rope-scaled config must actually change the logits (the factor is
    plumbed into the kernel, not just validated)."""
    from nanovllm_tpu.models import qwen3
    from nanovllm_tpu.models.qwen3 import Qwen3StaticConfig
    from nanovllm_tpu.utils.loader import load_params

    params = load_params(tiny_checkpoint, tiny_config, dtype=jnp.float32)
    scaled_cfg = dataclasses.replace(
        tiny_config, rope_scaling={"rope_type": "linear", "factor": 4.0})
    sc1 = Qwen3StaticConfig.from_model_config(tiny_config, attention_impl="xla")
    sc4 = Qwen3StaticConfig.from_model_config(scaled_cfg, attention_impl="xla")
    assert sc4.rope_scaling_factor == 4.0
    ids = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)
    h1 = qwen3.dense_forward(params, ids, pos, sc1)
    h4 = qwen3.dense_forward(params, ids, pos, sc4)
    assert not np.allclose(np.asarray(h1), np.asarray(h4))
