"""nanovllm_tpu: a TPU-native quantized LLM inference engine.

Brand-new JAX/XLA/Pallas implementation with the capability set of the
reference songxxzp/nano-vllm-hw3 (continuous batching, paged KV with prefix
caching, Qwen3, INT8/FP8 quantization, SPMD tensor parallelism).
"""

from nanovllm_tpu.llm import LLM
from nanovllm_tpu.sampling_params import SamplingParams

__all__ = ["LLM", "SamplingParams"]
__version__ = "0.1.0"
