"""ModelRunner: device execution — batch prep, bucketed jit steps, paged KV.

Capability parity with the reference ModelRunner (reference:
nanovllm/engine/model_runner.py:16-356), redesigned for XLA/TPU:

- **One process drives all local devices.** The reference spawns one process
  per TP rank with a SharedMemory RPC control plane (model_runner.py:67-115);
  under JAX SPMD a single controller jit-dispatches onto every chip in the
  mesh, so the control plane disappears.
- **CUDA graphs → bucketed jit.** The reference captures decode CUDA graphs at
  batch sizes [1,2,...,512] (model_runner.py:316-356). XLA compiles one
  executable per input shape; we bucket decode batch size and prefill token
  count to powers of two, pad, and let the jit cache play the role of the
  graph pool. Padded KV-store slots are -1 (dropped by the scatter).
- **KV cache**: two arrays [L, S, Hk, D] (S = num_blocks * block_size flat
  slots), donated through every step so XLA updates them in place. Sizing
  probes device memory stats like the reference's mem_get_info policy
  (model_runner.py:131-170).
- **Batch prep is vectorized numpy** — the reference's per-token Python loops
  (model_runner.py:193-209) are the known host-side scalability tax.
"""

import bisect
import logging
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.models.qwen3 import Qwen3StaticConfig
from nanovllm_tpu.ops.attention import DecodeMeta, PrefillMeta
from nanovllm_tpu.ops.layers import sample
from nanovllm_tpu.utils.loader import load_params

logger = logging.getLogger(__name__)


# HBM per chip by PJRT device_kind (used when memory_stats is unavailable)
_HBM_BYTES = {
    "TPU v4": 32 * 2**30,
    "TPU v5 lite": 16 * 2**30,
    "TPU v5e": 16 * 2**30,
    "TPU v5p": 95 * 2**30,
    "TPU v6 lite": 32 * 2**30,
    "TPU v6e": 32 * 2**30,
}


def _next_bucket(buckets, n):
    """Smallest bucket >= n, extending by doubling if needed."""
    i = bisect.bisect_left(buckets, n)
    if i < len(buckets):
        return buckets[i]
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


class ModelRunner:
    def __init__(self, config: Config, mesh=None, params=None):
        self.config = config
        hf = config.hf_config
        self.block_size = config.kvcache_block_size
        self.dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.kv_dtype = jnp.int8 if config.kv_cache_dtype == "int8" else self.dtype
        self.mesh = mesh
        self.rng_key = jax.random.key(0)
        self.step_counter = 0

        # --- sharding setup (single-chip: everything replicated/local) ---
        from nanovllm_tpu.parallel.sharding import ShardingPlan
        self.plan = ShardingPlan(mesh) if mesh is not None else None

        # --- static model config ---
        impl = config.attention_impl  # "auto" already resolved by Config
        quant_cfg = None
        if config.quant_type in ("per_tensor", "per_row", "per_group"):
            quant_cfg = (config.quant_type, config.group_size,
                         config.activation_quant, config.linear_dtype)
        self.sc = Qwen3StaticConfig.from_model_config(
            hf, block_size=self.block_size, attention_impl=impl, quant_cfg=quant_cfg)

        # --- parameters ---
        if params is None:
            if config.model and any(f.endswith(".safetensors")
                                    for f in os.listdir(os.path.expanduser(config.model))):
                params = load_params(config.model, hf, dtype=self.dtype)
            else:
                params = qwen3.init_params(hf, jax.random.key(0), dtype=self.dtype)
        params = self._quantize(params)
        if self.plan is not None:
            params = self.plan.shard_params(params)
        else:
            params = jax.device_put(params)
        self.params = jax.block_until_ready(params)

        # --- KV cache ---
        self._allocate_kv_cache()

        # --- jitted step functions (bucketed shapes hit the jit cache) ---
        self._prefill_jit = jax.jit(
            partial(_prefill_step, sc=self.sc), donate_argnums=(1, 2))
        self._decode_jit = jax.jit(
            partial(_decode_step, sc=self.sc), donate_argnums=(1, 2))

        self.decode_table_width = (config.max_model_len + self.block_size - 1) // self.block_size

    # ------------------------------------------------------------------ quant
    def _quantize(self, params):
        cfg = self.config
        from nanovllm_tpu.ops import quantization as q
        if cfg.weight_quant_fn is not None:
            params = q.apply_weight_fake_quant(params, cfg.weight_quant_fn)
        elif cfg.quant_type in ("per_tensor", "per_row", "per_group"):
            params = q.apply_weight_quant(params, cfg.quant_type, cfg.group_size,
                                          cfg.linear_dtype)
        elif cfg.linear_dtype != "bfloat16":
            params = q.apply_weight_fake_quant(
                params, partial(q.fake_cast, dtype=cfg.linear_dtype))
        return params

    # ------------------------------------------------------------------ KV
    def _kv_block_bytes(self):
        hf = self.config.hf_config
        itemsize = jnp.dtype(self.kv_dtype).itemsize
        return (2 * hf.num_hidden_layers * self.block_size
                * hf.num_key_value_heads * hf.head_dim * itemsize)

    def _allocate_kv_cache(self):
        """Size the paged cache from device memory (reference policy:
        model_runner.py:131-170) and allocate the flat-slot arrays."""
        cfg = self.config
        hf = cfg.hf_config
        if cfg.num_kvcache_blocks <= 0:
            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
            in_use = stats.get("bytes_in_use", 0)
            if not limit and dev.platform == "tpu":
                # Some PJRT transports don't expose memory stats; fall back to
                # the known HBM size per chip generation and count the params
                # we placed ourselves.
                limit = _HBM_BYTES.get(dev.device_kind, 16 * 2**30)
                in_use = sum(x.nbytes for x in jax.tree.leaves(self.params))
            if limit:
                # Reserve headroom for activations/logits the way the reference
                # subtracts warmup peak: prefill activations scale with
                # max_num_batched_tokens; logits with max_num_seqs * vocab.
                act = cfg.max_num_batched_tokens * hf.hidden_size * 2 * 24
                logits = cfg.max_num_seqs * hf.vocab_size * 4 * 2
                if self.sc.attention_impl == "xla":
                    # the XLA fallback gathers each sequence's padded KV and
                    # materializes fp32 scores; both must fit alongside the cache
                    W = (cfg.max_model_len + self.block_size - 1) // self.block_size
                    kv_bytes = jnp.dtype(self.kv_dtype).itemsize
                    gather = 2 * cfg.max_num_seqs * W * self.block_size \
                        * hf.num_key_value_heads * hf.head_dim * kv_bytes
                    t = cfg.max_num_batched_tokens
                    scores = max(hf.num_attention_heads * t * t * 4,
                                 cfg.max_num_seqs * hf.num_attention_heads
                                 * W * self.block_size * 4)
                    act += 2 * gather + 2 * scores
                budget = int(limit * cfg.gpu_memory_utilization) - in_use - act - logits
                cfg.num_kvcache_blocks = max(budget, 0) // self._kv_block_bytes()
            else:  # CPU / unknown backend: small default for tests
                cfg.num_kvcache_blocks = max(
                    64, 2 * cfg.max_num_seqs * cfg.max_model_len // self.block_size // 8)
        assert cfg.num_kvcache_blocks > 0, "not enough device memory for KV cache"
        num_slots = cfg.num_kvcache_blocks * self.block_size
        shape = (hf.num_hidden_layers, hf.num_key_value_heads, num_slots, hf.head_dim)
        sharding = self.plan.kv_sharding() if self.plan is not None else None
        self.k_caches = jnp.zeros(shape, self.kv_dtype, device=sharding)
        self.v_caches = jnp.zeros(shape, self.kv_dtype, device=sharding)
        logger.info("KV cache: %d blocks x %d slots (%.2f GiB)",
                    cfg.num_kvcache_blocks, self.block_size,
                    2 * np.prod(shape) * jnp.dtype(self.kv_dtype).itemsize / 2**30)

    # ------------------------------------------------------------------ prep
    def prepare_prefill(self, seqs: list[Sequence]) -> tuple[PrefillMeta, np.ndarray]:
        """Vectorized ragged-batch prep (reference: model_runner.py:182-237)."""
        bs = self.block_size
        cfg = self.config
        q_lens = np.array([len(s) - s.num_cached_tokens for s in seqs], np.int32)
        k_lens = np.array([len(s) for s in seqs], np.int32)
        T = _next_bucket(cfg.prefill_token_buckets, int(q_lens.sum()))
        Tk = _next_bucket(cfg.prefill_token_buckets, int(k_lens.sum()))
        B = cfg.max_num_seqs

        positions = np.zeros(T, np.int32)
        q_seg = np.full(T, -1, np.int32)
        slot_mapping = np.full(T, -1, np.int32)
        k_slots = np.zeros(Tk, np.int32)
        k_seg = np.full(Tk, -1, np.int32)
        k_pos = np.zeros(Tk, np.int32)
        last_idx = np.zeros(B, np.int32)
        temps = np.zeros(B, np.float32)

        qo = 0
        ko = 0
        for i, seq in enumerate(seqs):
            nq, nk = int(q_lens[i]), int(k_lens[i])
            table = np.asarray(seq.block_table, np.int64)
            pos_all = np.arange(nk, dtype=np.int32)
            slots_all = (table[pos_all // bs] * bs + pos_all % bs).astype(np.int32)
            positions[qo:qo + nq] = pos_all[nk - nq:]
            q_seg[qo:qo + nq] = i
            slot_mapping[qo:qo + nq] = slots_all[nk - nq:]
            k_slots[ko:ko + nk] = slots_all
            k_seg[ko:ko + nk] = i
            k_pos[ko:ko + nk] = pos_all
            last_idx[i] = qo + nq - 1
            temps[i] = seq.temperature
            qo += nq
            ko += nk

        input_ids = np.zeros(T, np.int32)
        qo = 0
        for i, seq in enumerate(seqs):
            nq = int(q_lens[i])
            input_ids[qo:qo + nq] = seq.token_ids[len(seq) - nq:]
            qo += nq

        meta = PrefillMeta(
            positions=jnp.asarray(positions), q_segment_ids=jnp.asarray(q_seg),
            slot_mapping=jnp.asarray(slot_mapping), k_slots=jnp.asarray(k_slots),
            k_segment_ids=jnp.asarray(k_seg), k_positions=jnp.asarray(k_pos),
            last_token_idx=jnp.asarray(last_idx), temperatures=jnp.asarray(temps))
        return meta, input_ids

    def prepare_decode(self, seqs: list[Sequence]) -> tuple[DecodeMeta, np.ndarray]:
        """Decode batch prep (reference: model_runner.py:239-270)."""
        cfg = self.config
        bs = self.block_size
        B = _next_bucket(cfg.decode_bs_buckets, len(seqs))
        W = self.decode_table_width

        input_ids = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        slot_mapping = np.full(B, -1, np.int32)
        block_tables = np.zeros((B, W), np.int32)
        context_lens = np.ones(B, np.int32)  # 1 at pad: keeps padded softmax finite
        temps = np.zeros(B, np.float32)
        for i, seq in enumerate(seqs):
            n = len(seq)
            input_ids[i] = seq.last_token
            positions[i] = n - 1
            last = seq.block_table[-1]
            slot_mapping[i] = last * bs + (n - 1) % bs
            block_tables[i, :len(seq.block_table)] = seq.block_table
            context_lens[i] = n
            temps[i] = seq.temperature

        meta = DecodeMeta(
            positions=jnp.asarray(positions), slot_mapping=jnp.asarray(slot_mapping),
            block_tables=jnp.asarray(block_tables), context_lens=jnp.asarray(context_lens),
            temperatures=jnp.asarray(temps))
        return meta, input_ids

    # ------------------------------------------------------------------ run
    def run(self, seqs: list[Sequence], is_prefill: bool) -> list[int]:
        self.step_counter += 1
        key = jax.random.fold_in(self.rng_key, self.step_counter)
        if is_prefill:
            meta, input_ids = self.prepare_prefill(seqs)
            tokens, self.k_caches, self.v_caches = self._prefill_jit(
                self.params, self.k_caches, self.v_caches, meta,
                jnp.asarray(input_ids), key)
        else:
            meta, input_ids = self.prepare_decode(seqs)
            tokens, self.k_caches, self.v_caches = self._decode_jit(
                self.params, self.k_caches, self.v_caches, meta,
                jnp.asarray(input_ids), key)
        return np.asarray(tokens)[: len(seqs)].tolist()

def _prefill_step(params, k_caches, v_caches, meta, input_ids, key, *, sc):
    h, k_caches, v_caches = qwen3.forward(params, input_ids, meta, k_caches, v_caches, sc)
    h_last = qwen3.select_last_tokens(h, meta)
    logits = qwen3.compute_logits(params, h_last, sc)
    tokens = sample(logits, meta.temperatures, key)
    return tokens, k_caches, v_caches


def _decode_step(params, k_caches, v_caches, meta, input_ids, key, *, sc):
    h, k_caches, v_caches = qwen3.forward(params, input_ids, meta, k_caches, v_caches, sc)
    logits = qwen3.compute_logits(params, h, sc)
    tokens = sample(logits, meta.temperatures, key)
    return tokens, k_caches, v_caches
