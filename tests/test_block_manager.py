"""Unit tests for the paged-block bookkeeping + prefix cache.

The reference has no unit suite (SURVEY.md §4); these cover the subtle logic:
rolling hash chains, collision verification, cache-hit crediting, decode-step
block maintenance, and the evicted-block revival path."""

from nanovllm_tpu.engine.block_manager import BlockManager, compute_hash
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

BS = 4


def seq(tokens):
    return Sequence(list(tokens), SamplingParams(), block_size=BS)


def test_hash_chain_commits_to_prefix():
    h1 = compute_hash([1, 2, 3, 4])
    h2 = compute_hash([1, 2, 3, 4], prefix=h1)
    assert h1 != h2
    assert compute_hash([1, 2, 3, 4], prefix=h1) == h2


def test_allocate_and_free():
    bm = BlockManager(8, BS)
    s = seq(range(10))  # 3 blocks (4+4+2)
    assert bm.can_allocate(s)
    bm.allocate(s)
    assert len(s.block_table) == 3
    assert bm.num_free_blocks == 5
    bm.deallocate(s)
    assert bm.num_free_blocks == 8
    assert not s.block_table


def test_prefix_cache_hit_credits_cached_tokens():
    bm = BlockManager(8, BS)
    a = seq([1, 2, 3, 4, 5, 6, 7, 8, 9])
    bm.allocate(a)
    b = seq([1, 2, 3, 4, 5, 6, 7, 8, 42])
    bm.allocate(b)
    assert b.num_cached_tokens == 8  # two full shared blocks
    assert b.block_table[:2] == a.block_table[:2]
    assert b.block_table[2] != a.block_table[2]
    assert bm.blocks[a.block_table[0]].ref_count == 2


def test_partial_block_never_cached():
    bm = BlockManager(8, BS)
    a = seq([1, 2, 3])  # < one block
    bm.allocate(a)
    b = seq([1, 2, 3])
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert a.block_table[0] != b.block_table[0]


def test_evicted_block_revived_from_free_list():
    bm = BlockManager(8, BS)
    a = seq([1, 2, 3, 4, 5, 6, 7, 8])
    bm.allocate(a)
    table = list(a.block_table)
    bm.deallocate(a)
    # blocks are free but retain hash/token contents → still cache hits
    # (cached credit is clamped to len-1 so the last token is recomputed)
    b = seq([1, 2, 3, 4, 5, 6, 7, 8])
    bm.allocate(b)
    assert b.num_cached_tokens == 7
    assert b.block_table == table


def test_may_append_block_lifecycle():
    bm = BlockManager(8, BS)
    s = seq([1, 2, 3])
    bm.allocate(s)
    assert bm.blocks[s.block_table[-1]].hash == -1

    # fill to exactly one block: hash finalized + registered
    s.append_token(4)
    bm.may_append(s)
    h = bm.blocks[s.block_table[-1]].hash
    assert h != -1 and bm.hash_to_block_id[h] == s.block_table[-1]

    # crossing into a new block allocates it
    s.append_token(5)
    assert bm.can_append(s)
    bm.may_append(s)
    assert len(s.block_table) == 2
    assert bm.blocks[s.block_table[-1]].hash == -1


def test_can_append_only_needs_block_at_boundary():
    bm = BlockManager(1, BS)
    s = seq([1, 2, 3, 4, 5])  # 2 blocks needed
    assert not bm.can_allocate(s)
    s2 = seq([1, 2])
    bm.allocate(s2)
    assert bm.num_free_blocks == 0
    # len=3 → no boundary crossing → ok without free blocks
    s2.append_token(3)
    assert bm.can_append(s2)
