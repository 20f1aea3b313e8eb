"""WikiText-2 perplexity via the model-as-a-library dense path.

Port of the reference PPL harness (reference: test_ppl.py:13-71): the model is
used *standalone* — no engine, no KV cache — through the cache-free
teacher-forcing forward (the reference's ``simple_attention=True`` mode,
nanovllm/layers/attention.py:78-96). Methodology parity: first 100 test texts,
independent 4096-token windows, summed cross-entropy, ``ppl = exp(loss/tokens)``.

TPU-native differences: windows are right-padded to static length buckets and
the loss is masked (XLA wants static shapes; the reference feeds each ragged
chunk eagerly), and logits come from a bf16 matmul with fp32 accumulation.
"""

import bisect
import os
import time
from functools import partial

import numpy as np

BUCKETS = (256, 512, 1024, 2048, 4096)


def ppl_over_token_chunks(params, sc, chunks, batch_size: int = 8):
    """Summed-CE perplexity over independent token chunks (each a list of
    ints, length >= 2). Chunks are bucketed/padded; CE is masked."""
    import jax
    import jax.numpy as jnp
    from nanovllm_tpu.models import qwen3

    @partial(jax.jit, static_argnames=("T",))
    def chunk_loss(params, ids, mask, T):
        # ids [B, T+1]: input = ids[:, :-1], target = ids[:, 1:]
        B = ids.shape[0]
        h = qwen3.dense_forward_batch(params, ids[:, :-1], sc)
        logits = qwen3.compute_logits(params, h.reshape(B * T, -1), sc)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:].reshape(-1)
        ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        return jnp.sum(ce * mask.reshape(-1))

    total_loss = 0.0
    total_tokens = 0
    # group chunks by bucket to bound compiles
    by_bucket: dict[int, list[list[int]]] = {}
    for chunk in chunks:
        T = len(chunk) - 1
        b = BUCKETS[min(bisect.bisect_left(BUCKETS, T), len(BUCKETS) - 1)]
        by_bucket.setdefault(b, []).append(chunk)
    for T, group in sorted(by_bucket.items()):
        for i in range(0, len(group), batch_size):
            batch = group[i:i + batch_size]
            ids = np.zeros((len(batch), T + 1), np.int32)
            mask = np.zeros((len(batch), T), np.float32)
            for j, chunk in enumerate(batch):
                n = len(chunk)
                ids[j, :n] = chunk
                mask[j, :n - 1] = 1.0
            total_loss += float(chunk_loss(params, jnp.asarray(ids),
                                           jnp.asarray(mask), T=T))
            total_tokens += int(mask.sum())
    return float(np.exp(total_loss / max(total_tokens, 1))), total_tokens


def chunk_texts(texts, tokenizer, max_length: int = 4096):
    """Reference chunking (test_ppl.py:45-57): per text, stride max_length
    over tokens, keeping overlapping next-token targets within the window."""
    chunks = []
    for text in texts:
        if not text.strip():
            continue
        tokens = tokenizer.encode(text, add_special_tokens=False)
        if len(tokens) < 2:
            continue
        for i in range(0, len(tokens) - 1, max_length):
            chunk = tokens[i: min(i + max_length + 1, len(tokens))]
            if len(chunk) >= 2:
                chunks.append(chunk)
    return chunks


def main(model_path=None, quant_kwargs=None, num_texts=100, dtype=None):
    import jax.numpy as jnp
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner
    from nanovllm_tpu.models.qwen3 import Qwen3StaticConfig
    from nanovllm_tpu.utils.data import SyntheticTokenizer, load_wikitext
    from nanovllm_tpu.utils.model_path import get_model_path

    model_path = model_path or get_model_path()
    cfg = Config(model_path, max_model_len=4096, num_kvcache_blocks=64,
                 **(quant_kwargs or {}))
    runner = ModelRunner(cfg)  # loads + quantizes weights; KV unused here
    sc = Qwen3StaticConfig.from_model_config(
        cfg.hf_config, attention_impl="xla", quant_cfg=runner.sc.quant_cfg)

    try:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(model_path, local_files_only=True)
    except Exception:
        tokenizer = SyntheticTokenizer(cfg.hf_config.vocab_size,
                                       cfg.hf_config.eos_token_id)

    texts, synthetic = load_wikitext(num_texts)
    chunks = chunk_texts(texts, tokenizer)
    t = time.time()
    ppl, total_tokens = ppl_over_token_chunks(runner.params, sc, chunks)
    elapsed = time.time() - t
    tag = " (SYNTHETIC fallback data — not comparable)" if synthetic else ""
    print(f"Perplexity: {ppl:.2f}{tag}")
    print(f"Tokens: {total_tokens}, Time: {elapsed:.2f}s")
    return {"ppl": ppl, "total_tokens": total_tokens, "time": elapsed,
            "synthetic_data": synthetic}


if __name__ == "__main__":
    main()
