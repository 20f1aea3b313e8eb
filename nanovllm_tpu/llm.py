"""Public entry point (reference: nanovllm/llm.py:4-5).

``data_parallel_size > 1`` (single-process) constructs a
``DataParallelEngine`` — request-level parallelism over independent engine
replicas (engine/dp_engine.py) — behind the same constructor surface.
"""

from nanovllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    def __new__(cls, model="", **kwargs):
        if kwargs.get("data_parallel_size", 1) > 1:
            import jax
            if jax.process_count() == 1:
                from nanovllm_tpu.engine.dp_engine import DataParallelEngine
                return DataParallelEngine(model, **kwargs)
        return super().__new__(cls)
