"""Per-request sampling parameters (reference: nanovllm/sampling_params.py:4-9).

The reference accepts ``temperature`` but its sampler is argmax-only
(reference: nanovllm/layers/sampler.py:5-12). We implement real temperature
sampling; ``temperature == 0.0`` selects greedy decoding, matching the
reference's effective behavior on its parity evals (test_mmlu.py uses 0.0).
"""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    # extensions beyond the reference surface (0 / 1.0 = disabled)
    top_k: int = 0
    top_p: float = 1.0
    # Unplannable stop after N completion tokens (None = disabled): finishes
    # the sequence like an EOS the scheduler could not foresee — unlike
    # max_tokens, the scheduler does NOT plan decode steps around it. Stands
    # in for EOS/stop-string termination in benchmarks and tests of the
    # speculative-decode-waste accounting.
    stop_after: int | None = None
