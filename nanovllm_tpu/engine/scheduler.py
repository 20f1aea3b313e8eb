"""Continuous-batching scheduler: prefill priority + youngest-first preemption.

Capability parity with the reference Scheduler (reference:
nanovllm/engine/scheduler.py:15-71): two deques (waiting/running); prefill
batches bounded by ``max_num_seqs`` and prefix-cache-aware
``max_num_batched_tokens``; decode batches with per-seq block reservation and
youngest-running preemption on block exhaustion; preempted sequences restart as
prefills and recover compute via the prefix cache.

Redesigned for the async TPU engine: a decode schedule covers K device steps
(``decode_steps_per_call``) and reserves KV pages for all of them up front;
token values materialize later (``postprocess``), which is also where EOS is
detected and prefix-cache hashes commit. Because the engine runs ahead of
materialization, destructive decisions (preemption, and any state the engine
must re-read) require a drained pipeline — ``schedule`` raises ``NeedDrain``
to ask the engine to materialize pending calls first.
"""

from collections import deque

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


class NeedDrain(Exception):
    """Scheduler needs the engine to materialize in-flight calls before it
    can make a safe decision (e.g. preemption while calls are outstanding)."""


class Scheduler:
    def __init__(self, config: Config):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.max_model_len = config.max_model_len
        self.eos = config.eos
        self.decode_steps = config.decode_steps_per_call
        self.mixed_batches = config.mixed_prefill_decode
        # prefill-lane count of the last mixed schedule (lanes beyond it are
        # piggybacked single-step decodes); consumed by the engine's step
        self.last_n_prefill = 0
        self.block_manager = BlockManager(config.num_kvcache_blocks, config.kvcache_block_size)
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        # count of non-finished seqs in ``running``: finished seqs are
        # removed lazily (postprocess marks, schedule drops on pop), so
        # membership alone can't answer is_finished in O(1)
        self.num_live = 0
        self.free_slots: deque[int] = deque(range(config.max_num_seqs))
        self.num_preemptions = 0
        # Strict admission: admit a prefill only when its worst-case final KV
        # footprint fits alongside every already-admitted sequence's. The
        # reference admits on *current* footprint and preempts on exhaustion
        # (scheduler.py:44-58) — cheap on a GPU where re-prefill is fast, but
        # each preemption discards computed KV and re-runs the prompt; under a
        # capacity-bound workload it thrashes (observed: 1.5x prefill work on
        # the bench). With reservation the pool never over-commits, so
        # preemption becomes a cold path instead of the steady state.
        self.reserve_on_admit = config.reserve_kv_on_admit
        # Admission horizon: reserve prompt + fraction*max_tokens. 1.0 =
        # worst-case (no preemption ever); < 1.0 over-commits the pool to
        # raise decode concurrency — decode efficiency grows with batch
        # size — and falls back to youngest-first preemption (with
        # prefix-cache KV recovery) for the sequences that outrun the
        # reservation. The fraction is the expected completion ratio of the
        # workload; 0.5 matches uniform-random output lengths.
        self.reserve_frac = config.kv_reserve_fraction
        self.total_blocks = config.num_kvcache_blocks
        self.committed_blocks = 0
        self.num_committed_seqs = 0
        # speculative-waste accounting (adaptive decode-K policy input):
        # tokens_appended = materialized completion tokens; wasted = scheduled
        # beyond an unplannable finish (EOS / stop_after) and discarded;
        # unplanned_finishes = finishes the planner could not foresee
        self.tokens_appended = 0
        self.decode_tokens_wasted = 0
        self.unplanned_finishes = 0

    def _projected_blocks(self, seq: Sequence) -> int:
        """Page footprint of a sequence at its admission horizon
        (prefix-cache sharing only ever lowers actual use)."""
        horizon = seq.num_prompt_tokens + int(self.reserve_frac * seq.max_tokens)
        horizon = min(self._max_len(seq), max(horizon, len(seq) + 1))
        return (horizon + self.block_manager.block_size - 1) \
            // self.block_manager.block_size

    def _commit(self, seq: Sequence):
        seq.committed_blocks = self._projected_blocks(seq)
        self.committed_blocks += seq.committed_blocks
        self.num_committed_seqs += 1

    def _uncommit(self, seq: Sequence):
        if getattr(seq, "committed_blocks", 0):
            self.committed_blocks -= seq.committed_blocks
            self.num_committed_seqs -= 1
            seq.committed_blocks = 0

    def is_finished(self) -> bool:
        return not self.waiting and self.num_live == 0

    def add(self, seq: Sequence):
        self.waiting.append(seq)

    def _max_len(self, seq: Sequence) -> int:
        """Total-token cap for a sequence: prompt + max_tokens, clipped to the
        model context window."""
        return min(seq.num_prompt_tokens + seq.max_tokens, self.max_model_len)

    def schedule(self, can_drain: bool = False) -> tuple[list[Sequence], bool, list[int]]:
        """Returns (seqs, is_prefill, steps). For prefill, steps is [1]*n (one
        sampled token per seq). Empty seqs means nothing schedulable — the
        engine should materialize pending calls. Raises NeedDrain when a safe
        decision needs the pipeline drained first (only if ``can_drain``)."""
        # prefill first (reference: scheduler.py:24-41). The token cap leaves
        # one page of headroom: batch prep buckets at q_sum + page_size (the
        # KV store may over-read the stream by up to a page), and a batch
        # packed to exactly max_num_batched_tokens would spill past the
        # largest warmed-up bucket into a never-precompiled double-size one.
        token_cap = self.max_num_batched_tokens - self.block_manager.block_size
        if self.mixed_batches:
            # leave one token of headroom per running lane so the piggyback
            # block below is never starved by a cap-packed prefill batch
            # (<= max_num_seqs of a >= max_model_len cap)
            token_cap -= min(self.num_live, self.max_num_seqs)
        self.last_n_prefill = 0
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_batched_tokens = 0
        while self.waiting and num_seqs < self.max_num_seqs and self.free_slots:
            seq = self.waiting[0]
            # budget the PADDED stream cost: batch prep 8-aligns every
            # seq's stream segment (model_runner.prepare), so packing by
            # real tokens could spill the padded sum past the largest
            # warmed bucket into a runtime-compiled double-size executable
            new_tokens = -(-(len(seq) - seq.num_cached_tokens) // 8) * 8
            # the soft cap only applies once the batch is non-empty: a lone
            # prompt of exactly max_num_batched_tokens tokens must still be
            # schedulable (it pays the one-off double-bucket spill instead
            # of starving)
            if ((num_batched_tokens + new_tokens > token_cap and scheduled)
                    or num_batched_tokens + new_tokens > self.max_num_batched_tokens
                    or not self.block_manager.can_allocate(seq)):
                break
            if (self.reserve_on_admit
                    and self.committed_blocks + self._projected_blocks(seq)
                    > self.total_blocks
                    and self.num_committed_seqs > 0):
                break
            num_seqs += 1
            self._commit(seq)
            self.block_manager.allocate(seq)
            # recount after allocate: prefix-cache hits just shrank the
            # uncached suffix (same padded accounting as the admission check)
            num_batched_tokens += \
                -(-(len(seq) - seq.num_cached_tokens) // 8) * 8
            seq.status = SequenceStatus.RUNNING
            seq.slot = self.free_slots.popleft()
            self.waiting.popleft()
            self.running.append(seq)
            self.num_live += 1
            scheduled.append(seq)
        if scheduled:
            # Mixed batch: piggyback one decode step for already-running
            # sequences onto this prefill dispatch (the ragged kernels
            # handle mixed q lengths natively), so decode lanes keep
            # advancing through prefill phases instead of stalling. Their
            # input token lives in the device-side last_tokens buffer
            # (it may not be materialized on the host yet); batch prep
            # marks these lanes via input_src_slot. Opportunistic: lanes
            # that cannot reserve a page are skipped, never preempted for.
            self.last_n_prefill = len(scheduled)
            if self.mixed_batches:
                new = {id(s) for s in scheduled}
                budget = (self.max_num_batched_tokens
                          - self.block_manager.block_size
                          - num_batched_tokens)
                for seq in self.running:
                    if (len(scheduled) >= self.max_num_seqs or budget <= 0):
                        break
                    if (id(seq) in new or seq.is_finished
                            or self._max_len(seq) - seq.num_sched_tokens < 1
                            or not self.block_manager.can_reserve(seq, 1)):
                        continue
                    self.block_manager.reserve(seq, 1)
                    scheduled.append(seq)
                    budget -= 1
            return scheduled, True, [1] * len(scheduled)

        # decode (reference: scheduler.py:44-58), K steps per call
        steps: list[int] = []
        postponed: list[Sequence] = []
        did_preempt = False
        while self.running and num_seqs < self.max_num_seqs:
            seq = self.running.popleft()
            if seq.is_finished:
                # lazy removal: postprocess marks sequences finished without
                # the O(running) deque.remove; they drop out here (their
                # blocks/slot were already released at materialization)
                continue
            k = min(self.decode_steps, self._max_len(seq) - seq.num_sched_tokens)
            if k <= 0:
                # fully scheduled; waiting for materialization to finish it
                postponed.append(seq)
                continue
            while not self.block_manager.can_reserve(seq, k):
                if can_drain:
                    # materialized finishes may free blocks; retry after drain
                    self.running.extendleft(reversed(scheduled + [seq]))
                    self.running.extend(postponed)
                    raise NeedDrain
                if self.running:
                    victim = self.running.pop()  # youngest first
                    if not victim.is_finished:   # lazy-removal leftovers
                        self.preempt(victim)
                        did_preempt = True
                else:
                    self.preempt(seq)
                    did_preempt = True
                    seq = None
                    break
            if seq is not None:
                num_seqs += 1
                self.block_manager.reserve(seq, k)
                scheduled.append(seq)
                steps.append(k)
        self.running.extendleft(reversed(scheduled))
        self.running.extend(postponed)
        if not scheduled and not postponed and self.waiting:
            can_alloc = self.block_manager.can_allocate(self.waiting[0])
            if did_preempt and can_alloc:
                # Everything self-preempted (reference would assert here,
                # scheduler.py:55): the freed blocks may now admit the
                # preempted seq as a fresh prefill via the prefix cache.
                # (Guarded on did_preempt: without freed resources this call,
                # re-running the same admission would recurse forever —
                # admission blocked by finished-but-inflight sequences clears
                # when the engine drains instead.)
                return self.schedule(can_drain)
            if not can_drain and not can_alloc:
                raise RuntimeError(
                    "KV cache too small: a single sequence exceeds capacity "
                    f"({self.block_manager.num_free_blocks} free blocks)")
        return scheduled, False, steps

    def preempt(self, seq: Sequence):
        assert seq.inflight == 0, "preempting a sequence with in-flight calls"
        self.num_preemptions += 1
        self.num_live -= 1  # leaves running (re-enters via admission)
        seq.status = SequenceStatus.WAITING
        seq.num_sched_tokens = seq.num_tokens
        if seq.slot is not None:
            self.free_slots.append(seq.slot)
            seq.slot = None
        self._uncommit(seq)
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)

    def postprocess(self, seqs: list[Sequence], steps: list[int],
                    token_matrix) -> list[Sequence]:
        """Materialize one call's sampled tokens: append up to steps[i] tokens
        per sequence (stopping at EOS / max_tokens), commit full-block hashes
        to the prefix cache, and finish sequences. Returns newly finished seqs.

        ``token_matrix`` is [K, B] (decode) or [1, B] (prefill) host ints.
        """
        finished = []
        bs = self.block_manager.block_size
        for i, seq in enumerate(seqs):
            seq.inflight -= 1
            for t in range(steps[i]):
                if seq.is_finished:
                    break
                token_id = int(token_matrix[t, i])
                seq.append_token(token_id)
                self.tokens_appended += 1
                if len(seq) % bs == 0:
                    self.block_manager.finalize_block(seq)
                unplanned = ((not seq.ignore_eos and token_id == self.eos)
                             or seq.num_completion_tokens == seq.stop_after)
                if unplanned or seq.num_completion_tokens == seq.max_tokens:
                    # removal from self.running is lazy (O(1) here; schedule()
                    # drops finished sequences when it pops them)
                    seq.status = SequenceStatus.FINISHED
                    self.num_live -= 1
                    finished.append(seq)
                    if unplanned:
                        self.unplanned_finishes += 1
                        # everything scheduled past this token is discarded
                        # speculative work (already-dispatched calls + the
                        # rest of this call's scan)
                        self.decode_tokens_wasted += \
                            seq.num_sched_tokens - seq.num_tokens
            if seq.is_finished and seq.inflight == 0:
                self._uncommit(seq)
                if seq.slot is not None:
                    self.free_slots.append(seq.slot)
                    seq.slot = None
                if seq.block_table:
                    self.block_manager.deallocate(seq)
        return finished
