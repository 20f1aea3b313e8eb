"""Tensor-parallel correctness: TP=2 sharded engine must reproduce TP=1
outputs exactly (SURVEY.md §7 stage-5 gate; the reference cannot test this —
quantization asserts tp_size==1 and TP needs real GPUs+NCCL, reference:
nanovllm/utils/quantization.py:360, model_runner.py:26-28)."""

import jax
import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.parallel.sharding import ShardingPlan, make_mesh


ENGINE_KW = dict(
    max_model_len=128, max_num_batched_tokens=256, max_num_seqs=8,
    kvcache_block_size=8, num_kvcache_blocks=96,
    decode_bs_buckets=(2, 4, 8), prefill_token_buckets=(32, 64, 128, 256),
    attention_impl="xla",
)


@pytest.fixture(scope="module")
def prompts(tiny_checkpoint):
    rng = np.random.default_rng(7)
    return [rng.integers(0, 512, size=n).tolist() for n in (5, 12, 19)]


@pytest.fixture(scope="module")
def tp1_outputs(tiny_checkpoint, prompts):
    llm = LLM(tiny_checkpoint, **ENGINE_KW)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    return [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]


def test_tp2_matches_tp1(tiny_checkpoint, prompts, tp1_outputs):
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    llm = LLM(tiny_checkpoint, mesh=mesh, **ENGINE_KW)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]
    assert outs == tp1_outputs


def test_tp2_quantized_matches_tp1_quantized(tiny_checkpoint, prompts):
    """Quant × TP composition — scales shard with their weight dim (the
    reference punts: quantization.py:360,378,397 assert tp_size==1)."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    q_kw = dict(quant_type="per_row", linear_dtype="int8", **ENGINE_KW)
    ref = LLM(tiny_checkpoint, **q_kw)
    ref_outs = [o["token_ids"] for o in ref.generate(prompts, sp, use_tqdm=False)]
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    tp = LLM(tiny_checkpoint, mesh=mesh, **q_kw)
    tp_outs = [o["token_ids"] for o in tp.generate(prompts, sp, use_tqdm=False)]
    assert tp_outs == ref_outs


@pytest.mark.parametrize("kv_dtype", ["int4", "int8_rs"])
def test_tp2_rowscale_kv_matches_tp1(tiny_checkpoint, prompts, kv_dtype):
    """Row-scale KV × TP composition (round-5): the interleaved head-pair
    pool layout shards on the kv-head axis with the log-scale sidecar
    replicated, so the quantized serving formats compose with TP — closing
    the same class of punt the reference makes for weights
    (reference: nanovllm/utils/quantization.py:360)."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    kw = dict(kv_cache_dtype=kv_dtype, **ENGINE_KW)
    ref = LLM(tiny_checkpoint, **kw)
    ref_outs = [o["token_ids"] for o in ref.generate(prompts, sp, use_tqdm=False)]
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    tp = LLM(tiny_checkpoint, mesh=mesh, **kw)
    pages, scales = tp.model_runner.kv_pages
    assert pages.sharding.spec == jax.sharding.PartitionSpec(
        None, None, "model", None)
    tp_outs = [o["token_ids"] for o in tp.generate(prompts, sp, use_tqdm=False)]
    assert tp_outs == ref_outs


def test_param_shardings_are_as_planned(tiny_config):
    """Every projection leaf lands with the planned spec on an 8-device mesh."""
    from nanovllm_tpu.models import qwen3

    mesh = make_mesh(data=2, model=4)
    plan = ShardingPlan(mesh)
    params = qwen3.init_params(tiny_config, jax.random.key(0))
    sharded = plan.shard_params(params)

    def spec(leaf):
        return leaf.sharding.spec

    ly = sharded["layers"]
    assert spec(ly["qkv_proj"]["w"]) == jax.sharding.PartitionSpec(None, None, "model")
    assert spec(ly["o_proj"]["w"]) == jax.sharding.PartitionSpec(None, "model", None)
    assert spec(ly["gate_up_proj"]["w"]) == jax.sharding.PartitionSpec(None, None, "model")
    assert spec(ly["down_proj"]["w"]) == jax.sharding.PartitionSpec(None, "model", None)
    assert spec(sharded["embed_tokens"]) == jax.sharding.PartitionSpec("model", None)
    assert spec(ly["input_ln"]) == jax.sharding.PartitionSpec()


def test_tp4_fp8_matches_tp1(tmp_path_factory, prompts):
    """BASELINE config 4 shape: FP8 weight+activation quant at TP=4 (virtual
    devices) reproduces the TP=1 FP8 engine token-for-token. Needs a model
    with 4 KV heads so heads shard evenly over the mesh."""
    from nanovllm_tpu.config import ModelConfig
    from nanovllm_tpu.utils.loader import save_synthetic_checkpoint

    cfg = ModelConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-6,
        tie_word_embeddings=True)
    path = tmp_path_factory.mktemp("ckpt4") / "tiny-qwen3-4kv"
    save_synthetic_checkpoint(str(path), cfg, seed=3)

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    q_kw = dict(quant_type="per_row", linear_dtype="fp8",
                activation_quant=True, **ENGINE_KW)
    ref = LLM(str(path), **q_kw)
    ref_outs = [o["token_ids"] for o in ref.generate(prompts, sp, use_tqdm=False)]
    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    tp = LLM(str(path), mesh=mesh, **q_kw)
    tp_outs = [o["token_ids"] for o in tp.generate(prompts, sp, use_tqdm=False)]
    assert tp_outs == ref_outs
