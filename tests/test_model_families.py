"""Model-family coverage beyond the reference's Qwen3: Qwen2 (QKV bias, no
q/k-norm) and Llama (untied head) checkpoints load and match HF logits.
(Reference supports Qwen3 only, nanovllm/models/qwen3.py; these are listed in
our SUPPORTED_ARCHITECTURES, nanovllm_tpu/config.py.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.models.qwen3 import Qwen3StaticConfig
from nanovllm_tpu.utils.loader import load_params


def _roundtrip_hf(tmp_path, hf_model, input_ids):
    import torch
    hf_model.eval()
    path = str(tmp_path / "ckpt")
    hf_model.save_pretrained(path, safe_serialization=True)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(input_ids[None, :]).long()).logits[0].numpy()
    return path, ref


def _our_logits(path, cfg, input_ids):
    params = load_params(path, cfg, dtype=jnp.float32)
    sc = Qwen3StaticConfig.from_model_config(cfg, attention_impl="xla")
    h = qwen3.dense_forward(params, jnp.asarray(input_ids, jnp.int32),
                            jnp.arange(len(input_ids), dtype=jnp.int32), sc)
    return np.asarray(qwen3.compute_logits(params, h, sc))


def test_qwen2_with_bias_matches_hf(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM
    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0, tie_word_embeddings=False)
    rng = np.random.default_rng(3)
    input_ids = rng.integers(0, 256, size=21)
    path, ref = _roundtrip_hf(tmp_path, Qwen2ForCausalLM(hf_cfg), input_ids)
    cfg = ModelConfig.from_json(path + "/config.json")
    assert cfg.architectures[0] == "Qwen2ForCausalLM"
    got = _our_logits(path, cfg, input_ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_llama_matches_hf(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, rope_theta=10000.0, tie_word_embeddings=False)
    rng = np.random.default_rng(4)
    input_ids = rng.integers(0, 256, size=17)
    path, ref = _roundtrip_hf(tmp_path, LlamaForCausalLM(hf_cfg), input_ids)
    cfg = ModelConfig.from_json(path + "/config.json")
    assert cfg.architectures[0] == "LlamaForCausalLM"
    got = _our_logits(path, cfg, input_ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_qwen2_engine_e2e(tmp_path):
    """Qwen2 (with bias) end-to-end through the paged async engine."""
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from nanovllm_tpu import LLM, SamplingParams
    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0, tie_word_embeddings=False)
    rng = np.random.default_rng(5)
    input_ids = rng.integers(0, 256, size=9)
    path, ref = _roundtrip_hf(tmp_path, Qwen2ForCausalLM(hf_cfg),
                              np.asarray(input_ids))
    cfg = ModelConfig.from_json(path + "/config.json")
    # fp32 so the engine matches the fp32 dense oracle exactly — in bf16 a random
    # untrained model's near-flat logits can flip the argmax late in the rollout.
    llm = LLM(path, max_model_len=128, max_num_batched_tokens=256, max_num_seqs=4,
              kvcache_block_size=8, num_kvcache_blocks=64, attention_impl="xla",
              dtype="float32")
    out = llm.generate([input_ids.tolist()],
                       SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
                       use_tqdm=False)[0]["token_ids"]
    # greedy rollout against the dense oracle
    toks = input_ids.tolist()
    for _ in range(8):
        logits = _our_logits(path, cfg, toks)
        toks.append(int(logits[-1].argmax()))
    assert out == toks[len(input_ids):]
