"""Numeric parity of the functional Qwen3 against HF transformers (torch CPU).

This is the foundational correctness gate (SURVEY.md §7 stage 1): the same
tiny checkpoint produces matching logits through (a) HF Qwen3ForCausalLM,
(b) our cache-free dense path, and (c) our paged prefill/decode engine path
(with the KV-store Pallas kernel in interpreter mode).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.models import qwen3
from nanovllm_tpu.models.qwen3 import Qwen3StaticConfig
from nanovllm_tpu.ops.attention import AttnMeta
from nanovllm_tpu.ops.pallas.kv_store import build_store_tables
from nanovllm_tpu.utils.loader import load_params

PS = 8  # page size for these tests


@pytest.fixture(scope="module")
def hf_logits(tiny_checkpoint):
    import torch
    from transformers import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(tiny_checkpoint, dtype=torch.float32)
    model.eval()
    rng = np.random.default_rng(1)
    input_ids = rng.integers(0, 512, size=(1, 33))
    with torch.no_grad():
        out = model(torch.from_numpy(input_ids))
    return input_ids[0], out.logits[0].numpy()


@pytest.fixture(scope="module")
def loaded(tiny_checkpoint, tiny_config):
    params = load_params(tiny_checkpoint, tiny_config, dtype=jnp.float32)
    sc = Qwen3StaticConfig.from_model_config(
        tiny_config, page_size=PS, pages_per_layer=16, attention_impl="xla",
        store_interpret=True)
    return params, sc


def make_meta(T, seq_specs, B=4, W=8):
    """seq_specs: list of (q_start, q_len, kv_len, block_table)."""
    positions = np.zeros(T, np.int32)
    q_seg = np.full(T, -1, np.int32)
    kv_lens = np.zeros(B, np.int32)
    page_indices = np.zeros((B, W), np.int32)
    cu = np.zeros(B + 1, np.int32)
    last_idx = np.zeros(B, np.int32)
    q_starts = np.zeros(len(seq_specs), np.int64)
    q_lens = np.zeros(len(seq_specs), np.int64)
    cached = np.zeros(len(seq_specs), np.int64)
    for i, (qs, ql, kl, table) in enumerate(seq_specs):
        positions[qs:qs + ql] = np.arange(kl - ql, kl)
        q_seg[qs:qs + ql] = i
        kv_lens[i] = kl
        page_indices[i, :len(table)] = table
        cu[i + 1] = cu[i] + ql
        last_idx[i] = qs + ql - 1
        q_starts[i] = qs
        q_lens[i] = ql
        cached[i] = kl - ql
    cu[len(seq_specs) + 1:] = cu[len(seq_specs)]
    store = build_store_tables(q_starts, q_lens, cached, page_indices, PS,
                               np_items=T // PS + B, ns_items=B)
    return AttnMeta(
        positions=jnp.asarray(positions), q_segment_ids=jnp.asarray(q_seg),
        kv_lens=jnp.asarray(kv_lens), page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray(cu), num_seqs=jnp.asarray([len(seq_specs)], jnp.int32),
        last_token_idx=jnp.asarray(last_idx),
        temperatures=jnp.zeros(B, jnp.float32),
        slot_ids=jnp.arange(B, dtype=jnp.int32),
        top_ks=jnp.zeros(B, jnp.int32), top_ps=jnp.ones(B, jnp.float32),
        store_page_src=jnp.asarray(store[0]), store_page_dst=jnp.asarray(store[1]),
        store_row_src=jnp.asarray(store[2]), store_row_dst_page=jnp.asarray(store[3]),
        store_row_dst_pos=jnp.asarray(store[4]), store_counts=jnp.asarray(store[5]))


def test_dense_forward_matches_hf(hf_logits, loaded):
    input_ids, ref = hf_logits
    params, sc = loaded
    T = len(input_ids)
    h = qwen3.dense_forward(params, jnp.asarray(input_ids, jnp.int32),
                            jnp.arange(T, dtype=jnp.int32), sc)
    logits = np.asarray(qwen3.compute_logits(params, h, sc))
    np.testing.assert_allclose(logits, ref, rtol=2e-3, atol=2e-3)


def test_paged_prefill_then_decode_matches_hf(hf_logits, loaded, tiny_config):
    """Prefill the first 32 tokens through the paged path, then decode token 33;
    every step's logits must match HF teacher forcing."""
    input_ids, ref = hf_logits
    params, sc = loaded
    L, Hk, D = sc.num_layers, sc.num_kv_heads, sc.head_dim
    kv_pages = jnp.zeros((L * 16, PS, 2 * Hk, D), jnp.float32)

    n = 32
    table = [3, 5, 7, 9]  # deliberately non-contiguous pages
    T = 48  # bucket with over-read margin (>= 32 + PS)
    meta = make_meta(T, [(0, n, n, table)])
    ids = jnp.asarray(np.pad(input_ids[:n], (0, T - n)), jnp.int32)
    h, kv_pages = qwen3.forward(params, ids, meta, kv_pages, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, meta), sc))
    np.testing.assert_allclose(logits[0], ref[n - 1], rtol=2e-3, atol=2e-3)

    # decode the 33rd token (teacher-forcing: feed the true token)
    dmeta = make_meta(4, [(0, 1, 33, table + [11])])
    ids = jnp.asarray([int(input_ids[32]), 0, 0, 0], jnp.int32)
    h, kv_pages = qwen3.forward(params, ids, dmeta, kv_pages, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, dmeta), sc))
    np.testing.assert_allclose(logits[0], ref[32], rtol=2e-3, atol=2e-3)


def test_prefix_cached_prefill_matches(hf_logits, loaded):
    """A second prefill that reuses 2 cached pages (16 tokens) must produce
    the same last-token logits as the full prefill."""
    input_ids, ref = hf_logits
    params, sc = loaded
    L, Hk, D = sc.num_layers, sc.num_kv_heads, sc.head_dim
    kv_pages = jnp.zeros((L * 16, PS, 2 * Hk, D), jnp.float32)

    table = [0, 1, 2, 3]
    T = 48
    full = make_meta(T, [(0, 32, 32, table)])
    ids = jnp.asarray(np.pad(input_ids[:32], (0, T - 32)), jnp.int32)
    _, kv_pages = qwen3.forward(params, ids, full, kv_pages, sc)

    # same 32 tokens, first 16 cached: only the last 16 run as queries
    partial = make_meta(T, [(0, 16, 32, table)])
    ids2 = np.zeros(T, np.int32)
    ids2[:16] = input_ids[16:32]
    h, kv_pages = qwen3.forward(params, jnp.asarray(ids2), partial, kv_pages, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, partial), sc))
    np.testing.assert_allclose(logits[0], ref[31], rtol=2e-3, atol=2e-3)


def test_multi_seq_ragged_batch(hf_logits, loaded):
    """Two sequences in one ragged batch produce the same logits as HF."""
    input_ids, ref = hf_logits
    params, sc = loaded
    L, Hk, D = sc.num_layers, sc.num_kv_heads, sc.head_dim
    kv_pages = jnp.zeros((L * 16, PS, 2 * Hk, D), jnp.float32)

    n1, n2 = 17, 24
    T = 64
    meta = make_meta(T, [(0, n1, n1, [1, 2, 4]), (n1, n2, n2, [8, 6, 0])])
    ids = np.zeros(T, np.int32)
    ids[:n1] = input_ids[:n1]
    ids[n1:n1 + n2] = input_ids[:n2]
    h, kv_pages = qwen3.forward(params, jnp.asarray(ids), meta, kv_pages, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, meta), sc))
    np.testing.assert_allclose(logits[0], ref[n1 - 1], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(logits[1], ref[n2 - 1], rtol=2e-3, atol=2e-3)


def test_quantized_kv_cache_close_to_hf(hf_logits, loaded, tiny_config):
    """int8 KV pages (global-scale dequant in attention) track HF logits
    within quantization noise — the kv_cache_dtype="int8" engine extension."""
    input_ids, ref = hf_logits
    params, _ = loaded
    scale = 0.0625
    sc = Qwen3StaticConfig.from_model_config(
        tiny_config, page_size=PS, pages_per_layer=16, attention_impl="xla",
        store_interpret=True, kv_quant=("int8", scale))
    L, Hk, D = sc.num_layers, sc.num_kv_heads, sc.head_dim
    kv_pages = jnp.zeros((L * 16, PS, 2 * Hk, D), jnp.int8)

    n = 32
    table = [3, 5, 7, 9]
    T = 48
    meta = make_meta(T, [(0, n, n, table)])
    ids = jnp.asarray(np.pad(input_ids[:n], (0, T - n)), jnp.int32)
    h, kv_pages = qwen3.forward(params, ids, meta, kv_pages, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, meta), sc))
    assert kv_pages.dtype == jnp.int8
    # same top-1 and small relative error vs the fp32 HF reference
    assert logits[0].argmax() == ref[n - 1].argmax()
    err = np.abs(logits[0] - ref[n - 1]).max() / (np.abs(ref[n - 1]).max() + 1e-6)
    assert err < 0.08, err

    # decode one token against the quantized cache
    dmeta = make_meta(4, [(0, 1, 33, table + [11])])
    ids = jnp.asarray([int(input_ids[32]), 0, 0, 0], jnp.int32)
    h, kv_pages = qwen3.forward(params, ids, dmeta, kv_pages, sc)
    logits = np.asarray(qwen3.compute_logits(params, qwen3.select_last_tokens(h, dmeta), sc))
    assert logits[0].argmax() == ref[32].argmax()
