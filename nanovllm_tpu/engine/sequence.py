"""Request state for the continuous-batching engine.

Capability parity with the reference ``Sequence`` (reference:
nanovllm/engine/sequence.py:14-83), redesigned:

- ``block_size`` is an instance attribute wired from ``Config.kvcache_block_size``
  (the reference hard-codes a 256 class attribute that must agree with the
  config — a latent mismatch we remove).
- no pickle-shrinking ``__getstate__``: the TPU engine is single-process per
  host (no per-rank worker processes), so sequences are never serialized on the
  hot path.
- async-engine state: the engine dispatches device work ahead of token
  materialization (the tunnel/PCIe round trip is off the hot path), so a
  sequence tracks ``num_sched_tokens`` (tokens that will exist once all
  in-flight calls land; ``num_tokens`` counts materialized ones), an
  ``inflight`` call count gating block deallocation, and a persistent device
  ``slot`` indexing the on-device last-token buffer.
"""

from enum import Enum, auto
from itertools import count

from nanovllm_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()

    def __init__(self, token_ids: list[int], sampling_params: SamplingParams = SamplingParams(),
                 block_size: int = 256):
        self.seq_id = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids = list(token_ids)
        self.last_token = token_ids[-1]
        self.num_tokens = len(self.token_ids)
        self.num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0
        self.block_table: list[int] = []
        self.block_size = block_size
        self.num_sched_tokens = self.num_tokens
        self.inflight = 0
        self.slot: int | None = None
        self.committed_blocks = 0  # KV pages reserved at admission (scheduler)
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos
        self.top_k = sampling_params.top_k
        self.top_p = sampling_params.top_p
        self.stop_after = sampling_params.stop_after

    def __len__(self):
        return self.num_tokens

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def is_finished(self):
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self):
        return self.num_tokens - self.num_prompt_tokens

    @property
    def prompt_token_ids(self):
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self):
        return self.token_ids[self.num_prompt_tokens:]

    @property
    def num_cached_blocks(self):
        return self.num_cached_tokens // self.block_size

    @property
    def num_blocks(self):
        return (self.num_tokens + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self):
        return self.num_tokens - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size: (i + 1) * self.block_size]

    def append_token(self, token_id: int):
        self.token_ids.append(token_id)
        self.last_token = token_id
        self.num_tokens += 1
