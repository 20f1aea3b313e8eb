"""Model-path resolution shared by the root harness scripts.

The reference scripts hard-code ``./Qwen3-1.7B/`` (reference: test_mmlu.py:22,
experiments.py:106). Here: ``$NANOVLLM_TPU_MODEL`` → ``~/huggingface/Qwen3-0.6B``
→ a synthesized Qwen3-0.6B checkpoint under /tmp (no hub access in this
environment; weight values don't change throughput and quality harnesses mark
synthetic runs)."""

import os

SYNTH_PATH = "/tmp/nanovllm_tpu_synth/qwen3-0.6b"


def get_model_path() -> str:
    path = os.environ.get("NANOVLLM_TPU_MODEL",
                          os.path.expanduser("~/huggingface/Qwen3-0.6B/"))
    if os.path.isdir(path):
        return path
    from nanovllm_tpu.config import ModelConfig
    from nanovllm_tpu.utils.loader import save_synthetic_checkpoint
    if not os.path.isfile(os.path.join(SYNTH_PATH, "model.safetensors")):
        save_synthetic_checkpoint(SYNTH_PATH, ModelConfig(), seed=0)
    return SYNTH_PATH
