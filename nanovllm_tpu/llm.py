"""Public entry point (reference: nanovllm/llm.py:4-5)."""

from nanovllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
