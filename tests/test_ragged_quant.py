"""Numeric tests for the in-house quantized ragged paged-attention kernel
(interpret mode on CPU). Oracle: dense masked softmax over the dequantized
gathered pages — exact up to the kernel's documented int8-MXU quantization
noise (dynamic per-row q and p quant, ~0.4% each)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.attention import (quantize_kv, take_kv_scales,
                                        unpack_int4)
from nanovllm_tpu.ops.pallas.ragged_quant import ragged_quant_attention

Hq, Hk, D, PS = 16, 8, 128, 16
G = Hq // Hk
P = 64
SCALE = 0.0883


def _make_rs_pool(kind, rng_key, outlier=True):
    raw = jax.random.normal(rng_key, (P * PS, 2 * Hk, D), jnp.float32)
    if outlier:
        # e^±2 per-row magnitude spread on the V heads ONLY (odd interleaved
        # indices): V rows are the unnormalized clipping hazard the rs
        # format exists for. K rows are q/k-RMSNormed in the models this
        # serves (|k| ~ O(1)); outlier K scales would amplify the int8
        # score path's ~1.4% quant noise through exp() into p errors the
        # real distribution never produces.
        rng = np.random.default_rng(7)
        mult = np.ones((P * PS, 2 * Hk, 1), np.float32)
        mult[:, 1::2] = np.exp(rng.uniform(-2, 2, (P * PS, Hk, 1)))
        raw = raw * jnp.asarray(mult)
    stored, scales = quantize_kv(raw, (kind, None))
    rh = Hk if kind == "int4_rs" else 2 * Hk
    pages = stored.reshape(P, PS, rh, D)
    spool = scales.reshape(P, PS, -1)
    # dequantized oracle pool (already in interleaved combined-head layout)
    unp = unpack_int4(stored) if kind == "int4_rs" else stored
    sc = np.asarray(take_kv_scales(scales, 2 * Hk)).astype(np.float32)
    deq = (np.asarray(unp).astype(np.float32) * sc[..., None]).reshape(
        P, PS, 2 * Hk, D)
    return pages, spool, deq


def _oracle_seq(deq_pages, q_seq, table, kv_len, q_len):
    """[q_len, Hq, D] causal attention of a seq's q tail over its pages."""
    rows = deq_pages[table].reshape(-1, 2 * Hk, D)[:kv_len]
    k, v = rows[:, 0::2, :], rows[:, 1::2, :]
    out = np.zeros((q_len, Hq, D), np.float32)
    for t in range(q_len):
        pos = kv_len - q_len + t
        for h in range(Hk):
            for g in range(G):
                s = (k[: pos + 1, h] @ q_seq[t, h * G + g]) * SCALE
                p = np.exp(s - s.max())
                p /= p.sum()
                out[t, h * G + g] = p @ v[: pos + 1, h]
    return out


def _run_case(kind, q_lens, kv_lens, seed=0, **kw):
    rng = np.random.default_rng(seed)
    pages, spool, deq = _make_rs_pool(kind, jax.random.key(seed + 1))
    n = len(q_lens)
    W = max(2, (max(kv_lens) + PS - 1) // PS)
    pi = np.stack([rng.permutation(P)[:W] for _ in range(n)]).astype(np.int32)
    T = int(sum(q_lens))
    q = jax.random.normal(jax.random.key(seed + 2), (T, Hq, D), jnp.float32)
    cu = np.zeros(n + 1, np.int32)
    np.cumsum(q_lens, out=cu[1:])
    out = np.asarray(ragged_quant_attention(
        q, pages, jnp.asarray(np.asarray(kv_lens, np.int32)),
        jnp.asarray(pi), jnp.asarray(cu),
        jnp.asarray([n], jnp.int32), spool, sm_scale=SCALE, kv_mode=kind,
        interpret=True, **kw))
    qn = np.asarray(q)
    for i in range(n):
        ref = _oracle_seq(deq, qn[cu[i]:cu[i + 1]], pi[i], kv_lens[i],
                          q_lens[i])
        got = out[cu[i]:cu[i + 1]]
        # int8-MXU q/p dynamic quant ~1-2% relative, and on SHORT contexts
        # the int4 nibble noise (1/14 per element) has few terms to average
        # over: observed tail ~3% on e^±2-outlier rows at kv_len=17
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=2e-1,
                                   err_msg=f"seq {i}")


@pytest.mark.parametrize("kind", ["int4_rs", "int8_rs"])
def test_decode_batch(kind):
    """One new token per seq (the decode-scan shape)."""
    _run_case(kind, q_lens=[1] * 6, kv_lens=[1, 17, 16, 33, 100, 128],
              num_queries_per_block=4)


@pytest.mark.parametrize("kind", ["int4_rs", "int8_rs"])
def test_ragged_prefill(kind):
    """Multi-seq ragged prefill incl. prefix-cached tails (q_len < kv_len)
    and q blocks spanning sequence boundaries."""
    _run_case(kind, q_lens=[7, 33, 16], kv_lens=[7, 49, 80],
              num_queries_per_block=8, num_kv_pages_per_block=2)


@pytest.mark.parametrize("kind", ["int4_rs"])
def test_mixed_batch(kind):
    """Prefill and decode sequences in ONE call — the capability the
    scheduler's mixed dispatch relies on."""
    _run_case(kind, q_lens=[1, 24, 1, 9], kv_lens=[65, 24, 100, 40],
              num_queries_per_block=8, num_kv_pages_per_block=3)


@pytest.mark.parametrize("kv_mode", ["bf16", "fp8"])
def test_float_page_modes(kv_mode):
    """bf16 / fp8 dense pages through the same kernel (the modes that let
    the engine drop the library ragged kernel from every pool's path)."""
    rng = np.random.default_rng(5)
    raw = jax.random.normal(jax.random.key(21), (P, PS, 2 * Hk, D),
                            jnp.float32) * 0.5
    if kv_mode == "bf16":
        pages = raw.astype(jnp.bfloat16)
        kw = {}
    else:
        pages = raw.astype(jnp.float8_e4m3fn)
        kw = {"kv_scale": 1.0}
    deq = np.asarray(pages.astype(jnp.float32))
    q_lens = [1, 5, 1, 17]
    kv_lens = [33, 21, 64, 40]
    n = len(q_lens)
    pi = np.stack([rng.permutation(P)[:4] for _ in range(n)]).astype(np.int32)
    T = int(sum(q_lens))
    q = jax.random.normal(jax.random.key(22), (T, Hq, D), jnp.float32)
    cu = np.zeros(n + 1, np.int32)
    np.cumsum(q_lens, out=cu[1:])
    out = np.asarray(ragged_quant_attention(
        q, pages, jnp.asarray(np.asarray(kv_lens, np.int32)),
        jnp.asarray(pi), jnp.asarray(cu), jnp.asarray([n], jnp.int32),
        sm_scale=SCALE, kv_mode=kv_mode, num_queries_per_block=8,
        num_kv_pages_per_block=2, interpret=True, **kw))
    qn = np.asarray(q)
    for i in range(n):
        ref = _oracle_seq(deq, qn[cu[i]:cu[i + 1]], pi[i], kv_lens[i],
                          q_lens[i])
        np.testing.assert_allclose(out[cu[i]:cu[i + 1]], ref,
                                   rtol=3e-2, atol=3e-2, err_msg=f"seq {i}")


def test_dense_int8_global_scale():
    """Dense interleaved int8 pages with a global scale (the shipping KV
    config) through the same kernel."""
    rng = np.random.default_rng(3)
    scale = 0.0625
    raw = jax.random.normal(jax.random.key(9), (P, PS, 2 * Hk, D),
                            jnp.float32) * 0.4
    pages = jnp.clip(jnp.round(raw / scale), -127, 127).astype(jnp.int8)
    deq = np.asarray(pages).astype(np.float32) * scale
    q_lens = [1, 5, 1]
    kv_lens = [33, 21, 64]
    n = len(q_lens)
    W = 4
    pi = np.stack([rng.permutation(P)[:W] for _ in range(n)]).astype(np.int32)
    T = int(sum(q_lens))
    q = jax.random.normal(jax.random.key(10), (T, Hq, D), jnp.float32)
    cu = np.zeros(n + 1, np.int32)
    np.cumsum(q_lens, out=cu[1:])
    out = np.asarray(ragged_quant_attention(
        q, pages, jnp.asarray(np.asarray(kv_lens, np.int32)),
        jnp.asarray(pi), jnp.asarray(cu), jnp.asarray([n], jnp.int32),
        sm_scale=SCALE, kv_mode="int8", kv_scale=scale,
        num_queries_per_block=4, interpret=True))
    qn = np.asarray(q)
    for i in range(n):
        ref = _oracle_seq(deq, qn[cu[i]:cu[i + 1]], pi[i], kv_lens[i],
                          q_lens[i])
        np.testing.assert_allclose(out[cu[i]:cu[i + 1]], ref,
                                   rtol=4e-2, atol=6e-2, err_msg=f"seq {i}")


@pytest.fixture(scope="module")
def d128_checkpoint(tmp_path_factory):
    """head_dim-128 tiny checkpoint (the serving geometry the kernel
    assumes); tiny everything else."""
    from nanovllm_tpu.config import ModelConfig
    from nanovllm_tpu.utils.loader import save_synthetic_checkpoint
    cfg = ModelConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=128,
        max_position_embeddings=256)
    d = str(tmp_path_factory.mktemp("ckpt") / "d128-qwen3")
    save_synthetic_checkpoint(d, cfg, seed=3)
    return d


_ENGINE_KW = dict(max_model_len=128, max_num_batched_tokens=256,
                  max_num_seqs=4, kvcache_block_size=16,
                  num_kvcache_blocks=48, decode_bs_buckets=(2, 4),
                  prefill_token_buckets=(64, 128, 256))


def test_engine_serving_path_int4_cpu(d128_checkpoint):
    """End-to-end engine run on the REAL rs serving path (ragged impl ->
    ragged_quant kernel in interpret mode) — not the XLA oracle the other
    engine tests use. Gates the full wiring: quantize+pack store, in-house
    prefill (no scratch dequant), decode scan, prefix-cache second pass."""
    from nanovllm_tpu import LLM, SamplingParams
    rng = np.random.default_rng(11)
    ref = LLM(d128_checkpoint, attention_impl="xla", **_ENGINE_KW)
    llm = LLM(d128_checkpoint, attention_impl="ragged", kv_cache_dtype="int4",
              **_ENGINE_KW)
    assert llm.config.attention_impl == "ragged"
    prompts = [rng.integers(0, 512, size=n).tolist() for n in (5, 21)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    refs = ref.generate(prompts, sp, use_tqdm=False)
    match = sum(a == b for o, r in zip(outs, refs)
                for a, b in zip(o["token_ids"], r["token_ids"]))
    total = sum(len(o["token_ids"]) for o in outs)
    assert match >= 0.7 * total, (match, total)
    again = llm.generate(prompts, sp, use_tqdm=False)
    assert [o["token_ids"] for o in again] == [o["token_ids"] for o in outs]


def test_rowscale_quant_roundtrip_quality():
    """int4_rs with per-row scales bounds relative error even with 100x
    per-row dynamic range (where a global int4 scale saturates or crushes)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((256, 16, 128)).astype(np.float32)
    x *= np.exp(rng.uniform(-2.3, 2.3, (256, 16, 1))).astype(np.float32)
    stored, scales = quantize_kv(jnp.asarray(x), ("int4_rs", None))
    sc = np.asarray(take_kv_scales(scales, 16)).astype(np.float32)
    deq = np.asarray(unpack_int4(stored)).astype(np.float32) * sc[..., None]
    rel = np.abs(deq - x).max(-1) / np.abs(x).max(-1)
    # 1/(2*7) rounding x up to 2^(1/8) log-scale ceil = 0.078 worst case
    assert rel.max() < 0.08
    stored8, scales8 = quantize_kv(jnp.asarray(x), ("int8_rs", None))
    sc8 = np.asarray(take_kv_scales(scales8, 16)).astype(np.float32)
    deq8 = np.asarray(stored8).astype(np.float32) * sc8[..., None]
    rel8 = np.abs(deq8 - x).max(-1) / np.abs(x).max(-1)
    assert rel8.max() < 0.008

def test_dense_int8_engine_flash_impl_cpu(d128_checkpoint):
    """attention_impl="flash" + dense int8 KV routes decode AND prefill to
    the in-house quantized ragged kernel (interpret on CPU); output stays
    close to the xla-oracle int8 engine (the in-house path adds bounded
    int8-MXU q/p quant noise)."""
    from nanovllm_tpu import LLM, SamplingParams
    rng = np.random.default_rng(13)
    kw = dict(kv_cache_dtype="int8", **_ENGINE_KW)
    ref = LLM(d128_checkpoint, attention_impl="xla", **kw)
    llm = LLM(d128_checkpoint, attention_impl="flash", **kw)
    prompts = [rng.integers(0, 512, size=n).tolist() for n in (5, 21)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    refs = ref.generate(prompts, sp, use_tqdm=False)
    match = sum(a == b for o, r in zip(outs, refs)
                for a, b in zip(o["token_ids"], r["token_ids"]))
    total = sum(len(o["token_ids"]) for o in outs)
    assert match >= 0.7 * total, (match, total)


@pytest.mark.parametrize("dbg", ["dma", "compute"])
def test_debug_attribution_modes_trace(dbg):
    """The dma/compute attribution modes (tools/ragged_quant_validate.py
    split stage) must keep tracing/running — outputs are garbage by design
    (timing-only), so only successful execution is asserted. DMA discipline
    note: "compute" skips ALL copy starts and waits (an ungated first
    prefetch once wedged the real chip)."""
    pages, spool, _ = _make_rs_pool("int4_rs", jax.random.key(1))
    n = 4
    pi = np.stack([np.arange(P)[:8] for _ in range(n)]).astype(np.int32)
    q = jax.random.normal(jax.random.key(2), (n, Hq, D), jnp.float32)
    cu = jnp.arange(n + 1, dtype=jnp.int32)
    out = ragged_quant_attention(
        q, pages, jnp.full((n,), 64, jnp.int32), jnp.asarray(pi), cu,
        jnp.asarray([n], jnp.int32), spool, sm_scale=SCALE,
        kv_mode="int4_rs", num_queries_per_block=4,
        num_kv_pages_per_block=2, interpret=True, debug=dbg)
    assert out.shape == (n, Hq, D)
    np.asarray(out)  # force execution
