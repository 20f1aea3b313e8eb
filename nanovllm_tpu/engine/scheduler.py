"""Continuous-batching scheduler: prefill priority + youngest-first preemption.

Capability parity with the reference Scheduler (reference:
nanovllm/engine/scheduler.py:15-71): two deques (waiting/running); prefill
batches bounded by ``max_num_seqs`` and prefix-cache-aware
``max_num_batched_tokens``; decode batches with per-seq ``can_append`` and
youngest-running preemption on block exhaustion; preempted sequences restart as
prefills and recover compute via the prefix cache.
"""

from collections import deque

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


class Scheduler:
    def __init__(self, config: Config):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        self.block_manager = BlockManager(config.num_kvcache_blocks, config.kvcache_block_size)
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def add(self, seq: Sequence):
        self.waiting.append(seq)

    def schedule(self) -> tuple[list[Sequence], bool]:
        # prefill first (reference: scheduler.py:24-41)
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_batched_tokens = 0
        while self.waiting and num_seqs < self.max_num_seqs:
            seq = self.waiting[0]
            new_tokens = len(seq) - seq.num_cached_tokens
            if (num_batched_tokens + new_tokens > self.max_num_batched_tokens
                    or not self.block_manager.can_allocate(seq)):
                break
            num_seqs += 1
            self.block_manager.allocate(seq)
            num_batched_tokens += len(seq) - seq.num_cached_tokens
            seq.status = SequenceStatus.RUNNING
            self.waiting.popleft()
            self.running.append(seq)
            scheduled.append(seq)
        if scheduled:
            return scheduled, True

        # decode (reference: scheduler.py:44-58)
        while self.running and num_seqs < self.max_num_seqs:
            seq = self.running.popleft()
            while not self.block_manager.can_append(seq):
                if self.running:
                    self.preempt(self.running.pop())  # youngest first
                else:
                    self.preempt(seq)
                    seq = None
                    break
            if seq is not None:
                num_seqs += 1
                self.block_manager.may_append(seq)
                scheduled.append(seq)
        if not scheduled:
            # Everything self-preempted (reference would assert here,
            # scheduler.py:55): retry — the freed blocks may now admit the
            # preempted seq as a fresh prefill via the prefix cache.
            if self.waiting and self.block_manager.can_allocate(self.waiting[0]):
                return self.schedule()
            raise RuntimeError(
                "KV cache too small: a single sequence exceeds capacity "
                f"({self.block_manager.num_free_blocks} free blocks)")
        self.running.extendleft(reversed(scheduled))
        return scheduled, False

    def preempt(self, seq: Sequence):
        seq.status = SequenceStatus.WAITING
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)

    def postprocess(self, seqs: list[Sequence], token_ids: list[int]):
        for seq, token_id in zip(seqs, token_ids):
            seq.append_token(token_id)
            if ((not seq.ignore_eos and token_id == self.eos)
                    or seq.num_completion_tokens == seq.max_tokens):
                seq.status = SequenceStatus.FINISHED
                self.block_manager.deallocate(seq)
                self.running.remove(seq)
