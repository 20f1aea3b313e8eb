"""Scheduler unit tests: prefill priority, token budget, multi-step
reservation, EOS-at-materialization, preemption."""

import numpy as np
import pytest

from nanovllm_tpu.config import Config, ModelConfig
from nanovllm_tpu.engine.scheduler import NeedDrain, Scheduler
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams


def make_scheduler(num_blocks=16, max_seqs=8, max_tokens=64, block_size=4,
                   decode_steps=1, reserve=False):
    # reserve=False: most tests exercise the reference-parity opportunistic
    # admission + preemption path; strict admission has its own tests below.
    cfg = Config(
        hf_config=ModelConfig(max_position_embeddings=max_tokens),
        max_num_seqs=max_seqs,
        max_num_batched_tokens=max_tokens,
        max_model_len=max_tokens,
        kvcache_block_size=block_size,
        num_kvcache_blocks=num_blocks,
        decode_steps_per_call=decode_steps,
        reserve_kv_on_admit=reserve,
    )
    return Scheduler(cfg)


_uniq = [0]


def seq(n, **kw):
    # distinct token streams so tests don't accidentally share prefix-cache blocks
    _uniq[0] += 1
    base = _uniq[0] * 1000
    return Sequence(list(range(base, base + n)), SamplingParams(**kw), block_size=4)


def dispatch(seqs, is_prefill, steps):
    """The engine-side bookkeeping done right after a device dispatch
    (engine/llm_engine.py:step)."""
    for s, k in zip(seqs, steps):
        if is_prefill:
            s.num_sched_tokens = s.num_tokens + 1
        else:
            s.num_sched_tokens += k
        s.inflight += 1


def run_call(sch, seqs, is_prefill, steps, token_fn=lambda t, i: 100):
    """dispatch + immediate materialization with tokens token_fn(step, seq_i)."""
    dispatch(seqs, is_prefill, steps)
    k = max(steps) if steps else 1
    mat = np.array([[token_fn(t, i) for i in range(len(seqs))] for t in range(k)])
    return sch.postprocess(seqs, steps, mat)


def test_prefill_batches_up_to_token_budget():
    # budgets count the PADDED stream cost (segments 8-align in batch prep):
    # a 30-token prompt charges 32
    sch = make_scheduler(num_blocks=32, max_tokens=96)
    for _ in range(3):
        sch.add(seq(30))
    seqs, is_prefill, steps = sch.schedule()
    assert is_prefill and len(seqs) == 2  # 3rd padded seq would exceed 96-4
    assert sch.last_n_prefill == 2
    run_call(sch, seqs, True, steps)
    seqs2, is_prefill2, _ = sch.schedule()
    assert is_prefill2 and len(seqs2) == 1


def test_decode_after_prefill():
    sch = make_scheduler()
    sch.add(seq(6))
    seqs, is_prefill, steps = sch.schedule()
    assert is_prefill
    run_call(sch, seqs, True, steps, lambda t, i: 99)
    seqs, is_prefill, steps = sch.schedule()
    assert not is_prefill and len(seqs) == 1 and steps == [1]
    assert seqs[0].last_token == 99


def test_multi_step_decode_reserves_blocks():
    sch = make_scheduler(num_blocks=16, decode_steps=6)
    s = seq(6, max_tokens=32, ignore_eos=True)  # 2 blocks for the prompt
    sch.add(s)
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, True, steps)
    assert len(s) == 7 and s.num_sched_tokens == 7
    seqs, is_prefill, steps = sch.schedule()
    assert not is_prefill and steps == [6]
    # next call stores KV for positions 6..11 → table must cover 12 tokens
    assert len(s.block_table) == 3
    dispatch(seqs, False, steps)
    assert s.num_sched_tokens == 13


def test_finish_on_eos_and_max_tokens():
    sch = make_scheduler()
    eos = sch.eos
    sch.add(seq(4, max_tokens=8))
    sch.add(seq(4, max_tokens=1))
    seqs, _, steps = sch.schedule()
    finished = run_call(sch, seqs, True, steps, lambda t, i: eos if i == 0 else 5)
    assert seqs[0].status == SequenceStatus.FINISHED  # eos
    assert seqs[1].status == SequenceStatus.FINISHED  # max_tokens
    assert set(finished) == set(seqs)
    assert sch.is_finished()
    assert len(sch.free_slots) == sch.max_num_seqs
    assert sch.block_manager.num_free_blocks == 16


def test_eos_mid_scan_truncates():
    """EOS in the middle of a K-step call: later tokens are discarded."""
    sch = make_scheduler(decode_steps=4)
    eos = sch.eos
    s = seq(4, max_tokens=16)
    sch.add(s)
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, True, steps)
    seqs, _, steps = sch.schedule()
    assert steps == [4]
    # tokens: [7, eos, 8, 9] → keep 7, eos; discard the rest
    finished = run_call(sch, seqs, False, steps,
                        lambda t, i: [7, eos, 8, 9][t])
    assert finished == [s]
    assert s.completion_token_ids == [100, 7, eos]


def test_ignore_eos():
    sch = make_scheduler()
    sch.add(seq(4, max_tokens=4, ignore_eos=True))
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, True, steps, lambda t, i: sch.eos)
    assert seqs[0].status == SequenceStatus.RUNNING


def test_lagged_finish_defers_dealloc_and_slot():
    """A sequence finishing while a later call is still in flight must keep
    its blocks and slot until that call materializes."""
    sch = make_scheduler(decode_steps=2)
    s = seq(4, max_tokens=5, ignore_eos=True)
    sch.add(s)
    seqs, _, steps = sch.schedule()
    dispatch(seqs, True, steps)           # call 1 (prefill) in flight
    seqs2, _, steps2 = sch.schedule()     # call 2 scheduled before call 1 lands
    assert seqs2 == [s] and steps2 == [2]
    dispatch(seqs2, False, steps2)
    seqs3, _, steps3 = sch.schedule()
    dispatch(seqs3, False, steps3)
    # materialize call 1; nothing finishes yet
    assert sch.postprocess(seqs, steps, np.array([[100]])) == []
    # materialize call 2
    sch.postprocess(seqs2, steps2, np.array([[101], [102]]))
    # materialize call 3: seq reaches max_tokens=5 → finishes
    fin = sch.postprocess(seqs3, steps3, np.array([[103], [104]]))
    assert fin == [s] and s.inflight == 0
    assert s.completion_token_ids == [100, 101, 102, 103, 104]
    assert sch.block_manager.num_free_blocks == 16
    assert len(sch.free_slots) == sch.max_num_seqs


def test_lazy_finished_removal():
    """postprocess marks sequences finished without scanning the running
    deque (O(1)); schedule() drops them when popped and never dispatches a
    finished sequence; is_finished converges after the lazy drain."""
    sch = make_scheduler(decode_steps=1)
    a, b = seq(4, max_tokens=1, ignore_eos=True), seq(4, max_tokens=8, ignore_eos=True)
    sch.add(a), sch.add(b)
    seqs, is_p, steps = sch.schedule()
    assert is_p and seqs == [a, b]
    run_call(sch, seqs, True, steps)      # a reaches max_tokens=1 → finished
    assert a.is_finished
    assert a in sch.running               # lazy: still parked in the deque
    seqs2, is_p2, steps2 = sch.schedule()
    assert seqs2 == [b] and not is_p2     # a dropped on pop, b scheduled
    assert a not in sch.running
    run_call(sch, seqs2, False, steps2, token_fn=lambda t, i: 0)  # b hits EOS... no: eos=-1
    # finish b by max_tokens
    while not b.is_finished:
        seqs3, _, steps3 = sch.schedule()
        run_call(sch, seqs3, False, steps3)
    # one lazy-drain schedule may be needed before is_finished flips
    sch.schedule()
    assert sch.is_finished()
    assert len(sch.free_slots) == sch.max_num_seqs


def test_stop_after_and_waste_accounting():
    """stop_after finishes a sequence the planner could not foresee; the
    tokens scheduled past the stop are counted as speculative waste."""
    sch = make_scheduler(decode_steps=4)
    s = seq(4, max_tokens=16, ignore_eos=True, stop_after=2)
    sch.add(s)
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, True, steps)          # prefill: completion token 1
    seqs2, _, steps2 = sch.schedule()
    assert steps2 == [4]                      # planner ignores stop_after
    dispatch(seqs2, False, steps2)
    # a second call is dispatched before the first materializes (async lag)
    seqs3, _, steps3 = sch.schedule()
    dispatch(seqs3, False, steps3)
    fin = sch.postprocess(seqs2, steps2, np.array([[101], [102], [103], [104]]))
    assert fin == [s] and s.completion_token_ids == [100, 101]
    assert sch.unplanned_finishes == 1
    # scheduled: 1 (prefill) + 4 + 4 = 9 tokens; used: 2 → wasted 7
    assert sch.decode_tokens_wasted == 7
    sch.postprocess(seqs3, steps3, np.array([[0]] * steps3[0]))
    assert sch.is_finished()


def test_schedule_empty_when_fully_scheduled():
    """A fully-scheduled-but-unmaterialized seq yields an empty schedule (the
    engine then drains)."""
    sch = make_scheduler(decode_steps=8)
    s = seq(4, max_tokens=3, ignore_eos=True)
    sch.add(s)
    seqs, _, steps = sch.schedule()
    dispatch(seqs, True, steps)
    seqs2, _, steps2 = sch.schedule()
    assert steps2 == [2]  # 3 completion tokens total: 1 from prefill + 2
    dispatch(seqs2, False, steps2)
    seqs3, is_prefill3, _ = sch.schedule(can_drain=True)
    assert seqs3 == [] and not is_prefill3


def test_preemption_youngest_first_and_prefix_recovery():
    # 4 blocks of 4 slots; two seqs of 7 tokens each consume 2 blocks each.
    sch = make_scheduler(num_blocks=4, max_tokens=32)
    a, b = seq(7, max_tokens=9), seq(7)  # a fits 4 blocks exactly (16 tokens)
    sch.add(a)
    sch.add(b)
    seqs, is_prefill, steps = sch.schedule()
    assert len(seqs) == 2
    run_call(sch, seqs, True, steps)  # both now 8 tokens (2 full blocks)
    seqs, is_prefill, steps = sch.schedule()  # position 7 KV: no new block
    assert len(seqs) == 2 and not is_prefill
    run_call(sch, seqs, False, steps)  # both now 9 tokens
    # next call stores position 8's KV → needs a 3rd block each; 0 free →
    # youngest (b) preempted
    seqs, is_prefill, steps = sch.schedule()
    assert not is_prefill
    assert seqs == [a]
    assert b.status == SequenceStatus.WAITING
    run_call(sch, seqs, False, steps, lambda t, i: 101)
    # b restarts as a prefill once a finishes
    while a.status != SequenceStatus.FINISHED:
        seqs, is_prefill, steps = sch.schedule()
        if not seqs:
            break
        run_call(sch, seqs, is_prefill, steps, lambda t, i: 102)
    seqs, is_prefill, steps = sch.schedule()
    assert is_prefill and seqs == [b]
    # b re-prefills its full 8 tokens (its cached blocks were recycled by a's
    # decode growth here; block-level revival is covered in test_block_manager)
    assert len(b) == 9 and b.num_cached_tokens % 4 == 0


def test_reserve_admission_defers_instead_of_preempting():
    """With reserve_kv_on_admit, a prefill whose worst-case footprint would
    overcommit the pool waits instead of being admitted and later preempted."""
    # 4 blocks of 4 slots; each seq needs 4 blocks at its final length 16.
    sch = make_scheduler(num_blocks=4, max_tokens=32, reserve=True)
    a = seq(4, max_tokens=12, ignore_eos=True)
    b = seq(4, max_tokens=12, ignore_eos=True)
    sch.add(a)
    sch.add(b)
    seqs, is_prefill, steps = sch.schedule()
    assert is_prefill and seqs == [a]          # b deferred, not admitted
    assert b.status == SequenceStatus.WAITING
    assert sch.committed_blocks == 4
    run_call(sch, seqs, True, steps)
    # run a to completion: never a preemption
    while a.status != SequenceStatus.FINISHED:
        seqs, is_prefill, steps = sch.schedule()
        assert seqs == [a] and not is_prefill
        run_call(sch, seqs, False, steps)
    assert sch.num_preemptions == 0
    assert sch.committed_blocks == 0
    # a's reservation released → b admits now
    seqs, is_prefill, _ = sch.schedule()
    assert is_prefill and seqs == [b]
    assert sch.committed_blocks == 4


def test_reserve_admits_single_oversized_seq():
    """The first sequence is always admitted even if its projection exceeds
    the pool — matches the reference's ability to run one long sequence and
    rely on max_model_len clipping."""
    sch = make_scheduler(num_blocks=4, max_tokens=32, reserve=True)
    s = seq(4, max_tokens=28, ignore_eos=True)  # projection 32 tokens = 8 > 4 blocks
    sch.add(s)
    seqs, is_prefill, _ = sch.schedule()
    assert is_prefill and seqs == [s]


def test_reserve_released_on_preemption():
    """Preempting a committed sequence returns its reservation; re-admission
    re-commits."""
    sch = make_scheduler(num_blocks=4, max_tokens=32, reserve=True)
    s = seq(4, max_tokens=28, ignore_eos=True)  # oversized: will self-preempt
    sch.add(s)
    seqs, _, steps = sch.schedule()
    committed = sch.committed_blocks
    assert committed == 8
    sch.preempt(s)
    assert sch.committed_blocks == 0 and s.committed_blocks == 0
    seqs, is_prefill, _ = sch.schedule()
    assert is_prefill and sch.committed_blocks == committed


def test_preemption_blocked_by_inflight_raises_needdrain():
    sch = make_scheduler(num_blocks=4, max_tokens=32)
    a, b = seq(7, max_tokens=9), seq(7)
    sch.add(a)
    sch.add(b)
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, True, steps)
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, False, steps)  # both at 9 tokens: block pressure next
    # pretend another call is still in flight → preemption must wait
    with pytest.raises(NeedDrain):
        sch.schedule(can_drain=True)
    # drained: preemption proceeds
    seqs, is_prefill, steps = sch.schedule(can_drain=False)
    assert seqs == [a] and b.status == SequenceStatus.WAITING


def test_prefill_batches_leave_bucket_margin():
    """Prefill admission must stop one page short of max_num_batched_tokens:
    batch prep buckets at q_sum + page_size, and packing to the exact cap
    would spill past the largest precompiled bucket (runtime compile + 2x
    compute on that call)."""
    cfg = Config(
        hf_config=ModelConfig(max_position_embeddings=512),
        max_num_seqs=64,
        max_num_batched_tokens=512,
        max_model_len=512,
        kvcache_block_size=16,
        num_kvcache_blocks=512,
        reserve_kv_on_admit=False,
    )
    sched = Scheduler(cfg)
    for _ in range(10):
        sched.add(Sequence(list(range(100)),
                           SamplingParams(max_tokens=4, ignore_eos=True),
                           block_size=16))
    seqs, is_prefill, _ = sched.schedule()
    assert is_prefill
    total = sum(len(s) - s.num_cached_tokens for s in seqs)
    assert total <= 512 - 16


def test_lone_full_length_prompt_is_schedulable():
    """A single prompt of exactly max_num_batched_tokens must still be
    admitted (the bucket-margin soft cap applies only to non-empty batches;
    a lone oversized prompt pays the one-off bucket spill, never starves)."""
    cfg = Config(
        hf_config=ModelConfig(max_position_embeddings=256),
        max_num_seqs=4,
        max_num_batched_tokens=256,
        max_model_len=256,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        reserve_kv_on_admit=False,
    )
    sched = Scheduler(cfg)
    sched.add(Sequence(list(range(256)), SamplingParams(max_tokens=1),
                       block_size=16))
    seqs, is_prefill, _ = sched.schedule()
    assert is_prefill and len(seqs) == 1


def test_mixed_batch_piggybacks_running_seqs():
    """mixed_prefill_decode: a prefill schedule appends running sequences as
    single-step decode lanes (with a page reserved each), marked off by
    last_n_prefill."""
    cfg = Config(
        hf_config=ModelConfig(max_position_embeddings=64),
        max_num_seqs=8, max_num_batched_tokens=64, max_model_len=64,
        kvcache_block_size=4, num_kvcache_blocks=32,
        decode_steps_per_call=1, reserve_kv_on_admit=False,
        mixed_prefill_decode=True)
    sch = Scheduler(cfg)
    a = seq(10, max_tokens=8, ignore_eos=True)
    sch.add(a)
    seqs, _, steps = sch.schedule()
    run_call(sch, seqs, True, steps)
    sch.add(seq(12, max_tokens=4))
    seqs2, is_p2, steps2 = sch.schedule()
    assert is_p2 and sch.last_n_prefill == 1
    assert seqs2[1] is a and steps2 == [1, 1]
    # engine-side bookkeeping for the mixed call
    seqs2[0].num_sched_tokens = seqs2[0].num_tokens + 1
    a.num_sched_tokens += 1
    assert a.num_sched_tokens == 12  # prompt 10 + prefill token + piggyback
