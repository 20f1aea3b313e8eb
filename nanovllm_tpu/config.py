"""Engine configuration.

Capability parity with the reference Config (reference: nanovllm/config.py:9-35),
re-designed for a JAX/TPU engine:

- the reference reads an HF ``AutoConfig`` from a model directory; we support the
  same but also accept an inline ``ModelConfig`` so the engine runs hermetically
  (no hub access) for tests and synthetic benchmarks.
- ``enforce_eager`` (reference: CUDA-graph opt-out) maps to disabling the
  jit-bucket machinery; on TPU everything is jitted, so it only disables
  shape-bucketing (one compile per exact shape instead).
- TPU-specific knobs: ``decode_block_bucket`` / token bucketing policy, KV cache
  dtype, and mesh shape for SPMD sharding.
"""

import json
import os
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    """Architecture hyperparameters (subset of HF Qwen3Config we consume).

    Mirrors the fields the reference reads off ``AutoConfig``
    (reference: nanovllm/models/qwen3.py:147-176, config.py:31-34).
    """

    architectures: tuple = ("Qwen3ForCausalLM",)
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    # HF rope_scaling dict ({"rope_type"|"type": ..., "factor": ...}) or None.
    # "linear" is implemented (positions / factor); anything else fails
    # loudly at config time. The reference plumbs the field and asserts it is
    # None (reference: nanovllm/layers/rotary_embedding.py:57-59) — silently
    # ignoring it would produce wrong logits on long-context checkpoints.
    rope_scaling: dict | None = None
    max_position_embeddings: int = 40960
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    torch_dtype: str = "bfloat16"
    eos_token_id: int = 151645
    bos_token_id: int = 151643

    @staticmethod
    def from_json(path: str) -> "ModelConfig":
        with open(path) as f:
            raw = json.load(f)
        cfg = ModelConfig()
        for k in list(vars(cfg)):
            if k in raw:
                v = raw[k]
                if k == "architectures":
                    v = tuple(v)
                setattr(cfg, k, v)
        if "head_dim" not in raw:
            cfg.head_dim = cfg.hidden_size // cfg.num_attention_heads
        return cfg


def rope_scaling_factor(cfg: ModelConfig) -> float:
    """Resolve rope_scaling to a linear position divisor, or raise.

    The reference hard-rejects any rope_scaling (rotary_embedding.py:57-59);
    we support the "linear" type (ops.layers.rope_cos_sin divides positions
    by the factor) and reject NTK/yarn/llama3 variants loudly rather than
    loading a long-context checkpoint into silently-wrong logits."""
    rs = cfg.rope_scaling
    if rs is None:
        return 1.0
    kind = rs.get("rope_type", rs.get("type"))
    if kind == "linear":
        factor = float(rs.get("factor", 1.0))
        assert factor >= 1.0, rs
        return factor
    raise ValueError(
        f"unsupported rope_scaling {rs!r}: only type 'linear' is implemented "
        f"(the reference rejects all scaling)")


# Known architectures; extended by the model registry (models/__init__.py).
SUPPORTED_ARCHITECTURES = ("Qwen3ForCausalLM", "Qwen2ForCausalLM", "LlamaForCausalLM")


@dataclass
class Config:
    """Engine configuration (reference: nanovllm/config.py:9-35).

    ``model`` may be a directory containing ``config.json`` (+ ``*.safetensors``)
    or empty/None when ``hf_config`` is given inline.
    """

    model: str = ""
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 512
    max_model_len: int = 4096
    gpu_memory_utilization: float = 0.9  # fraction of HBM given to weights+KV
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    enforce_eager: bool = False
    hf_config: ModelConfig | None = None
    eos: int = -1
    # Page size of the paged KV cache. The reference hard-codes 256
    # (config.py:29); 64 reads less padding per decode step on TPU and gives
    # finer-grained prefix caching.
    kvcache_block_size: int = 64
    num_kvcache_blocks: int = -1

    # --- quantization (reference: config.py:22-25) ---
    linear_dtype: str = "bfloat16"           # bf16 | int8 | fp8 (storage dtype)
    weight_quant_fn: object = None           # fake-quant callable applied to weights
    quant_type: str | None = None            # per_tensor | per_row | per_group | smoothquant
    group_size: int = 128
    # KV-cache storage dtype. "auto" = model dtype. "int8"/"fp8" halve the
    # page bytes (≈2x the concurrent batch on a capacity-bound workload);
    # "int8_rs" adds dynamic per-(row, head) scales in a log-encoded int8
    # sidecar (removes the global-scale clipping hazard on unnormalized V
    # rows; +128 B/token-row = 6.25% over int8 pages); "int4" halves the
    # data bytes again — K|V nibbles of each head pair packed per byte,
    # same per-row scales (row = 1024 B data + 128 B scales, so int4
    # capacity is ~1.78x int8). The reference reserves this knob but never
    # implements it (config.py:24 comment). The _rs/int4 pools are served
    # prefill AND decode by the in-house quantized ragged kernel
    # (ops/pallas/ragged_quant.py).
    kv_cache_dtype: str = "auto"      # auto | int8 | fp8 | int8_rs | int4
    # Global dequant scale for plain int8 KV (stored = round(x / scale)).
    # Qwen3's per-head q/k RMSNorm keeps |k| ~ O(1); for int8, 1/16 covers
    # ±7.9 with ~0.03 rounding noise. fp8 (e4m3) and the row-scale modes
    # need no global scale.
    kv_cache_scale: float = 0.0625
    # Piggyback one decode step per running sequence onto each prefill
    # dispatch (mixed ragged batch): decode lanes keep advancing through
    # prefill phases instead of stalling — an inter-token-latency feature
    # for online serving. The reference schedules prefill XOR decode
    # (reference: scheduler.py:24-58). Default off: on the offline
    # throughput bench the round-4 A/B measured it neutral-to-negative
    # (6717 vs ~6850 tok/s, 1282 piggybacked tokens = ~1% of decode) —
    # a single chip has no idle compute for mixing to reclaim, so the
    # piggyback only re-times tokens while adding prep overhead.
    mixed_prefill_decode: bool = False
    activation_quant: bool = True            # per_row/per_tensor → W8A8 when True
    # Admit a prefill only when its worst-case final KV footprint
    # (prompt + max_tokens, clipped to max_model_len) fits alongside all
    # admitted sequences. Eliminates preemption thrash under KV pressure at
    # the cost of lower concurrency when max_tokens is much larger than
    # typical completions. False restores the reference's opportunistic
    # admission + preemption (reference: scheduler.py:44-58).
    reserve_kv_on_admit: bool = True
    # Fraction of max_tokens reserved at admission (1.0 = worst-case, never
    # preempts; lower over-commits for higher decode batch occupancy and
    # relies on youngest-first preemption + prefix-cache recovery).
    kv_reserve_fraction: float = 1.0

    # --- TPU-specific ---
    # Decode steps fused into one device call (lax.scan): sampled tokens feed
    # the next step on device, so the host↔device round trip is paid once per
    # K steps instead of per token (the reference reads tokens back every
    # step, model_runner.py:308-314). 16 measured ~8% faster than 8 on the
    # offline bench (fewer materialization round trips); EOS detection lags
    # by at most async_lag*K speculative tokens on EOS-terminated workloads.
    decode_steps_per_call: int = 16
    # In-flight device calls the engine dispatches ahead of token
    # materialization (EOS detection lags by at most lag*K steps).
    async_lag: int = 3
    # Shrink K per decode call when the observed unplannable-finish hazard
    # (EOS / stop_after per materialized token) makes deep scans wasteful:
    # picks the largest K in {K, K/2, K/4} with expected waste fraction
    # h*(async_lag+0.5)*K <= decode_waste_target. ignore_eos workloads never
    # observe a hazard, so the bench path always runs at full K.
    adaptive_decode_steps: bool = True
    decode_waste_target: float = 0.1
    dtype: str = "bfloat16"
    mesh_shape: tuple | None = None          # (data, model); default (dp, tp)
    decode_bs_buckets: tuple = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
    prefill_token_buckets: tuple = (256, 512, 1024, 2048, 4096, 8192, 16384)
    attention_impl: str = "auto"             # auto | ragged (Pallas) | xla
    # (num_kv_pages_per_block, num_queries_per_block) for the ragged kernel,
    # per batch kind. The library's auto-tune table has no entries for this
    # GQA shape (16q/8kv heads, D=128, page=64) on v5e and falls back to
    # (128, 32); the tools/attn_tune.py sweeps measured 6.6x (prefill) /
    # 4.4x (decode) faster blocks at bench-realistic shapes. Either one tuple
    # for every shape bucket, or a dict {bucket: (bkv, bq)} keyed by the
    # prefill token bucket / decode batch bucket (looked up at jit-build
    # time: the smallest table key >= the bucket, else the largest). None =
    # library default. Decode defaults are the NANOVLLM_TUNE_KV=int8 sweep
    # optima (the shipped KV dtype; bf16-page optima differ).
    attn_blocks_prefill: tuple | dict | None | str = "auto"  # by KV dtype
    attn_blocks_decode: tuple | dict | None | str = "auto"  # by KV dtype
    # Pre-compile every prefill/decode shape bucket at engine init (the
    # reference's warmup_model + capture_cudagraph, model_runner.py:117-129,
    # 316-356). With the persistent jit cache this is a disk read after the
    # first run on a machine; it keeps compiles out of the serving path.
    warmup_jit: bool = True
    # Also pre-compile the top-k/top-p sampler variant of every bucket
    # (doubles first-ever warmup time; without it the first request using
    # top_k/top_p pays a runtime compile per bucket).
    warmup_topkp: bool = True

    def __post_init__(self):
        # Pallas paged kernels want TPU-lane-aligned pages; the XLA fallback
        # (and host-logic tests) accept any positive size.
        assert self.kvcache_block_size > 0
        assert 1 <= self.tensor_parallel_size <= 64
        if self.hf_config is None:
            cfg_path = os.path.join(os.path.expanduser(self.model), "config.json")
            assert os.path.isfile(cfg_path), f"no config.json under {self.model!r}"
            self.hf_config = ModelConfig.from_json(cfg_path)
        arch = self.hf_config.architectures[0]
        assert arch in SUPPORTED_ARCHITECTURES, f"unsupported architecture {arch}"
        rope_scaling_factor(self.hf_config)  # fail loudly on unsupported types
        self.max_model_len = min(self.max_model_len, self.hf_config.max_position_embeddings)
        assert self.max_num_batched_tokens >= self.max_model_len
        if self.eos == -1:
            self.eos = self.hf_config.eos_token_id
        if self.mesh_shape is None:
            self.mesh_shape = (self.data_parallel_size, self.tensor_parallel_size)
        assert self.decode_steps_per_call >= 1 and self.async_lag >= 0
        assert 0.0 <= self.kv_reserve_fraction <= 1.0
        if self.quant_type is not None:
            assert self.quant_type in ("per_tensor", "per_row", "per_group", "smoothquant")
        assert self.linear_dtype in ("bfloat16", "int8", "fp8")
        assert self.kv_cache_dtype in ("auto", "int8", "fp8", "int8_rs", "int4")
        if self.attention_impl == "auto":
            import jax
            self.attention_impl = "ragged" if jax.default_backend() == "tpu" else "xla"
        if self.attention_impl not in ("ragged", "xla", "flash", "library"):
            raise ValueError(
                f"attention_impl must be one of 'auto', 'ragged', 'xla', "
                f"'flash', 'library'; got {self.attention_impl!r}")
        if self.kv_cache_dtype in ("int8_rs", "int4"):
            # rs pools are served by the in-house quantized ragged kernel
            # (ops/pallas/ragged_quant.py), whose lane geometry assumes
            # head_dim 128 (the model family's value). The XLA oracle path
            # (tests) is generic.
            if self.attention_impl != "xla" and self.hf_config.head_dim != 128:
                raise ValueError(
                    f"kv_cache_dtype={self.kv_cache_dtype!r} requires "
                    f"head_dim 128 (ragged_quant kernel), got "
                    f"{self.hf_config.head_dim}")
            # rs pools interleave K/V per head (round 5) and shard on the
            # head axis like the dense pools; the int8 log-scale sidecar is
            # replicated (parallel/sharding.kv_scales_sharding). tp must
            # divide the kv heads so every device holds whole K/V pairs.
            if self.hf_config.num_key_value_heads % self.tensor_parallel_size:
                raise ValueError(
                    f"kv_cache_dtype={self.kv_cache_dtype!r} requires "
                    f"tensor_parallel_size ({self.tensor_parallel_size}) to "
                    f"divide num_key_value_heads "
                    f"({self.hf_config.num_key_value_heads})")
        if self.attn_blocks_prefill == "auto":
            # round-5 T=8k sweep: the in-house rs kernel prefers (16, 128)
            # — 0.94x the tuned library kernel's prefill wall for int4
            # (round 4's weak leg at 1.30x, closed by the SWAR nibble
            # decode); other pools keep the library-tuned (16, 256)
            self.attn_blocks_prefill = ((16, 128) if self.kv_cache_dtype
                                        in ("int4", "int8_rs") else (16, 256))
        if self.attn_blocks_decode == "auto":
            # block optima differ by page dtype and kernel; the binding
            # sweep is tools/ragged_quant_validate.py `decode mixed`
            # (per-seq contexts drawn from the bench's 100-1024 range —
            # uniform-1k sweeps overrate large kv blocks, whose masked
            # compute past kv_len is pure waste on short sequences):
            # in-house rs kernel (4, 8); in-house bf16 (8, 8); library
            # kernel on dense int8 pages (16, 8)
            if self.kv_cache_dtype in ("int4", "int8_rs"):
                self.attn_blocks_decode = (4, 8)
            elif self.kv_cache_dtype in ("int8", "fp8"):
                self.attn_blocks_decode = (16, 8)
            else:
                self.attn_blocks_decode = (8, 8)
        if self.attention_impl == "xla":
            # The masked-softmax oracle materializes [T, B-context] fp32
            # scores; bound the batch so it stays test-sized. The Pallas
            # kernels have no such limits.
            self.max_num_batched_tokens = min(self.max_num_batched_tokens,
                                              max(4096, self.max_model_len))
            self.max_num_seqs = min(self.max_num_seqs, 128)
        # buckets must cover the configured maxima
        self.decode_bs_buckets = tuple(
            b for b in sorted(self.decode_bs_buckets) if b <= self.max_num_seqs
        ) or (self.max_num_seqs,)
        if self.decode_bs_buckets[-1] < self.max_num_seqs:
            self.decode_bs_buckets = self.decode_bs_buckets + (self.max_num_seqs,)
        self.prefill_token_buckets = tuple(
            t for t in sorted(self.prefill_token_buckets) if t <= self.max_num_batched_tokens
        ) or (self.max_num_batched_tokens,)
        if self.prefill_token_buckets[-1] < self.max_num_batched_tokens:
            self.prefill_token_buckets = self.prefill_token_buckets + (self.max_num_batched_tokens,)
