"""Numeric parity of the functional Qwen3 against HF transformers (torch CPU).

This is the foundational correctness gate (SURVEY.md §7 stage 1): the same
tiny checkpoint produces matching logits through (a) HF Qwen3ForCausalLM,
(b) our cache-free dense path, and (c) our paged prefill/decode engine path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.models.qwen3 import Qwen3StaticConfig
from nanovllm_tpu.ops.attention import DecodeMeta, PrefillMeta
from nanovllm_tpu.utils.loader import load_params


@pytest.fixture(scope="module")
def hf_logits(tiny_checkpoint):
    import torch
    from transformers import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(tiny_checkpoint, torch_dtype=torch.float32)
    model.eval()
    rng = np.random.default_rng(1)
    input_ids = rng.integers(0, 512, size=(1, 33))
    with torch.no_grad():
        out = model(torch.from_numpy(input_ids))
    return input_ids[0], out.logits[0].numpy()


@pytest.fixture(scope="module")
def loaded(tiny_checkpoint, tiny_config):
    params = load_params(tiny_checkpoint, tiny_config, dtype=jnp.float32)
    sc = Qwen3StaticConfig.from_model_config(tiny_config, block_size=8, attention_impl="xla")
    return params, sc


def test_dense_forward_matches_hf(hf_logits, loaded):
    input_ids, ref = hf_logits
    params, sc = loaded
    T = len(input_ids)
    h = qwen3.dense_forward(params, jnp.asarray(input_ids, jnp.int32),
                            jnp.arange(T, dtype=jnp.int32), sc)
    logits = np.asarray(qwen3.compute_logits(params, h, sc))
    np.testing.assert_allclose(logits, ref, rtol=2e-3, atol=2e-3)


def _prefill_meta(T_pad, Tk_pad, n, bs, block_table, temps=0.0, n_cached=0):
    """Build single-sequence prefill metadata by hand."""
    positions = np.zeros(T_pad, np.int32)
    q_seg = np.full(T_pad, -1, np.int32)
    slot_map = np.full(T_pad, -1, np.int32)
    k_slots = np.zeros(Tk_pad, np.int32)
    k_seg = np.full(Tk_pad, -1, np.int32)
    k_pos = np.zeros(Tk_pad, np.int32)
    nq = n - n_cached
    pos_all = np.arange(n)
    slots_all = np.array([block_table[p // bs] * bs + p % bs for p in pos_all], np.int32)
    positions[:nq] = pos_all[n_cached:]
    q_seg[:nq] = 0
    slot_map[:nq] = slots_all[n_cached:]
    k_slots[:n] = slots_all
    k_seg[:n] = 0
    k_pos[:n] = pos_all
    last = np.zeros(4, np.int32)
    last[0] = nq - 1
    return PrefillMeta(
        positions=jnp.asarray(positions), q_segment_ids=jnp.asarray(q_seg),
        slot_mapping=jnp.asarray(slot_map), k_slots=jnp.asarray(k_slots),
        k_segment_ids=jnp.asarray(k_seg), k_positions=jnp.asarray(k_pos),
        last_token_idx=jnp.asarray(last), temperatures=jnp.full((4,), temps, jnp.float32))


def test_paged_prefill_then_decode_matches_hf(hf_logits, loaded, tiny_config):
    """Prefill the first 32 tokens through the paged path, then decode token 33;
    every step's logits must match HF teacher forcing."""
    input_ids, ref = hf_logits
    params, sc = loaded
    bs = 8
    num_blocks = 16
    S = num_blocks * bs
    L, Hk, D = sc.num_layers, sc.num_kv_heads, sc.head_dim
    k_caches = jnp.zeros((L, Hk, S, D), jnp.float32)
    v_caches = jnp.zeros((L, Hk, S, D), jnp.float32)

    n_prefill = 32
    table = [3, 5, 7, 9]  # deliberately non-contiguous blocks
    meta = _prefill_meta(48, 48, n_prefill, bs, table)
    h, k_caches, v_caches = qwen3.forward(
        params, jnp.asarray(np.pad(input_ids[:n_prefill], (0, 16)), jnp.int32),
        meta, k_caches, v_caches, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, meta), sc))
    np.testing.assert_allclose(logits[0], ref[n_prefill - 1], rtol=2e-3, atol=2e-3)

    # decode the 33rd token (we feed the true token, teacher-forcing style)
    B = 4
    W = 8
    block_tables = np.zeros((B, W), np.int32)
    block_tables[0, : len(table) + 1] = table + [11]
    dmeta = DecodeMeta(
        positions=jnp.asarray(np.array([32, 0, 0, 0], np.int32)),
        slot_mapping=jnp.asarray(np.array([11 * bs + 0, -1, -1, -1], np.int32)),
        block_tables=jnp.asarray(block_tables),
        context_lens=jnp.asarray(np.array([33, 1, 1, 1], np.int32)),
        temperatures=jnp.zeros(B, jnp.float32))
    ids = jnp.asarray(np.array([input_ids[32], 0, 0, 0], np.int32))
    h, k_caches, v_caches = qwen3.forward(params, ids, dmeta, k_caches, v_caches, sc)
    logits = np.asarray(qwen3.compute_logits(params, h, sc))
    np.testing.assert_allclose(logits[0], ref[32], rtol=2e-3, atol=2e-3)


def test_prefix_cached_prefill_matches(hf_logits, loaded):
    """A second prefill that reuses 2 cached blocks (16 tokens) must produce
    the same last-token logits as the full prefill."""
    input_ids, ref = hf_logits
    params, sc = loaded
    bs = 8
    S = 16 * bs
    L, Hk, D = sc.num_layers, sc.num_kv_heads, sc.head_dim
    k_caches = jnp.zeros((L, Hk, S, D), jnp.float32)
    v_caches = jnp.zeros((L, Hk, S, D), jnp.float32)

    table = [0, 1, 2, 3]
    full = _prefill_meta(48, 48, 32, bs, table)
    ids = jnp.asarray(np.pad(input_ids[:32], (0, 16)), jnp.int32)
    _, k_caches, v_caches = qwen3.forward(params, ids, full, k_caches, v_caches, sc)

    # same 32 tokens, first 16 "cached": only the last 16 run as queries
    partial = _prefill_meta(48, 48, 32, bs, table, n_cached=16)
    ids2 = np.zeros(48, np.int32)
    ids2[:16] = input_ids[16:32]
    h, k_caches, v_caches = qwen3.forward(params, jnp.asarray(ids2), partial,
                                          k_caches, v_caches, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, partial), sc))
    np.testing.assert_allclose(logits[0], ref[31], rtol=2e-3, atol=2e-3)
