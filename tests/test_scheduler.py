"""Scheduler unit tests: prefill priority, token budget, preemption."""

from nanovllm_tpu.config import Config, ModelConfig
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams


def make_scheduler(num_blocks=16, max_seqs=8, max_tokens=64, block_size=4):
    cfg = Config(
        hf_config=ModelConfig(max_position_embeddings=max_tokens),
        max_num_seqs=max_seqs,
        max_num_batched_tokens=max_tokens,
        max_model_len=max_tokens,
        kvcache_block_size=block_size,
        num_kvcache_blocks=num_blocks,
    )
    return Scheduler(cfg)


_uniq = [0]


def seq(n, **kw):
    # distinct token streams so tests don't accidentally share prefix-cache blocks
    _uniq[0] += 1
    base = _uniq[0] * 1000
    return Sequence(list(range(base, base + n)), SamplingParams(**kw), block_size=4)


def test_prefill_batches_up_to_token_budget():
    sch = make_scheduler(num_blocks=32, max_tokens=64)
    for _ in range(3):
        sch.add(seq(30))
    seqs, is_prefill = sch.schedule()
    assert is_prefill and len(seqs) == 2  # 3rd would exceed 64 tokens
    seqs2, is_prefill2 = sch.schedule()
    assert is_prefill2 and len(seqs2) == 1


def test_decode_after_prefill():
    sch = make_scheduler()
    sch.add(seq(6))
    seqs, is_prefill = sch.schedule()
    assert is_prefill
    sch.postprocess(seqs, [99])
    seqs, is_prefill = sch.schedule()
    assert not is_prefill and len(seqs) == 1
    assert seqs[0].last_token == 99


def test_finish_on_eos_and_max_tokens():
    sch = make_scheduler()
    eos = sch.eos
    sch.add(seq(4, max_tokens=8))
    sch.add(seq(4, max_tokens=1))
    seqs, _ = sch.schedule()
    sch.postprocess(seqs, [eos, 5])
    assert seqs[0].status == SequenceStatus.FINISHED  # eos
    assert seqs[1].status == SequenceStatus.FINISHED  # max_tokens
    assert sch.is_finished()


def test_ignore_eos():
    sch = make_scheduler()
    sch.add(seq(4, max_tokens=4, ignore_eos=True))
    seqs, _ = sch.schedule()
    sch.postprocess(seqs, [sch.eos])
    assert seqs[0].status == SequenceStatus.RUNNING


def test_preemption_youngest_first_and_prefix_recovery():
    # 4 blocks of 4 slots; two seqs of 7 tokens each consume 2 blocks each.
    sch = make_scheduler(num_blocks=4, max_tokens=32)
    a, b = seq(7, max_tokens=9), seq(7)  # a fits 4 blocks exactly (16 tokens)
    sch.add(a)
    sch.add(b)
    seqs, is_prefill = sch.schedule()
    assert len(seqs) == 2
    sch.postprocess(seqs, [100, 100])  # both now 8 tokens (2 full blocks)
    seqs, is_prefill = sch.schedule()  # len 8 → no boundary; both decode
    assert len(seqs) == 2 and not is_prefill
    sch.postprocess(seqs, [100, 100])  # both now 9 tokens → next step crosses
    # the boundary: each needs a block, none free → youngest (b) preempted
    seqs, is_prefill = sch.schedule()
    assert not is_prefill
    assert seqs == [a]
    assert b.status == SequenceStatus.WAITING
    sch.postprocess(seqs, [101])
    # b restarts as a prefill once a finishes
    while a.status != SequenceStatus.FINISHED:
        seqs, is_prefill = sch.schedule()
        if not seqs:
            break
        sch.postprocess(seqs, [102] * len(seqs))
    seqs, is_prefill = sch.schedule()
    assert is_prefill and seqs == [b]
    # b re-prefills its full 9 tokens (its cached blocks were recycled by a's
    # decode growth here; block-level revival is covered in test_block_manager)
    assert len(b) == 9 and b.num_cached_tokens % 4 == 0
