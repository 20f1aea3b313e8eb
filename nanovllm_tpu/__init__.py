"""nanovllm_tpu: a TPU-native quantized LLM inference engine.

Brand-new JAX/XLA/Pallas implementation with the capability set of the
reference songxxzp/nano-vllm-hw3 (continuous batching, paged KV with prefix
caching, Qwen3, INT8/FP8 quantization, SPMD tensor parallelism).

Importing the package is side-effect free (no eager jax import, no global
config mutation): the persistent-jit-cache setup runs at first engine
construction (ModelRunner), and ``LLM`` / ``SamplingParams`` resolve lazily.
"""

import os as _os

_jit_cache_enabled = False


def enable_persistent_jit_cache():
    """Compile each jit shape once per machine, not once per process.

    XLA compiles are expensive (tens of seconds per bucket through a remote
    compile service); the persistent cache serves them from disk across
    processes — the TPU analogue of the reference keeping CUDA graphs warm
    within a process (reference: model_runner.py:316-356), but durable.
    Called automatically at first engine construction. Opt out with
    NANOVLLM_TPU_NO_JIT_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR (respected by jax itself).
    """
    global _jit_cache_enabled
    if _jit_cache_enabled or _os.environ.get("NANOVLLM_TPU_NO_JIT_CACHE") == "1":
        return
    _jit_cache_enabled = True
    import jax

    try:
        if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/nanovllm_tpu_jit"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass


def __getattr__(name):
    if name == "LLM":
        from nanovllm_tpu.llm import LLM
        return LLM
    if name == "SamplingParams":
        from nanovllm_tpu.sampling_params import SamplingParams
        return SamplingParams
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["LLM", "SamplingParams", "enable_persistent_jit_cache"]
__version__ = "0.1.0"
