"""Public entry point (reference: nanovllm/llm.py:4-5).

``data_parallel_size > 1`` constructs a DP engine behind the same
constructor surface: ``DataParallelEngine`` (single process, replicas over
disjoint local submeshes) or ``MultiHostDPEngine`` (multi-process, one or
more replicas per host with outputs allgathered) — engine/dp_engine.py.
"""

from nanovllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    def __new__(cls, model="", **kwargs):
        if kwargs.get("data_parallel_size", 1) > 1:
            import jax
            if jax.process_count() == 1:
                from nanovllm_tpu.engine.dp_engine import DataParallelEngine
                return DataParallelEngine(model, **kwargs)
            from nanovllm_tpu.engine.dp_engine import MultiHostDPEngine
            return MultiHostDPEngine(model, **kwargs)
        return super().__new__(cls)
