"""Paged-KV block bookkeeping with rolling-hash prefix caching.

Host-side only: the device KV arrays live in the ModelRunner and are addressed
by flat slot ids ``block_id * block_size + offset``.

Capability parity with the reference BlockManager (reference:
nanovllm/engine/block_manager.py:8-112): ref-counted blocks, chained
(prefix-committing) block hashes, hash-collision verification by token
comparison, cache-hit crediting of ``num_cached_tokens``, and the
evicted-but-resident free-block reuse path. The hash function is pluggable:
xxhash when present, else blake2b (both little-endian chained over the block's
token array bytes); a C++ fast path can be slotted in via ``_hash_impl``.
"""

from collections import deque

import numpy as np

try:  # xxhash is the reference's choice (block_manager.py:2); optional here
    import xxhash

    def _hash_impl(data: bytes) -> int:
        return xxhash.xxh64(data).intdigest()
except ImportError:  # pragma: no cover
    # in-repo native XXH64 (csrc/nanovllm_core.cpp), blake2b last resort
    from nanovllm_tpu.utils.native import xxh64 as _hash_impl


def compute_hash(token_ids: list[int], prefix: int = -1) -> int:
    """Chained block hash: commits to the whole prefix (reference: block_manager.py:35-41)."""
    data = (prefix & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") + np.asarray(token_ids, dtype=np.int64).tobytes()
    return _hash_impl(data)


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []

    def update(self, h: int, token_ids: list[int]):
        self.hash = h
        self.token_ids = token_ids

    def reset(self):
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self.block_size = block_size
        self.blocks: list[Block] = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        self.free_block_ids: deque[int] = deque(range(num_blocks))
        self.used_block_ids: set[int] = set()

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def _allocate_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        return block

    def _deallocate_block(self, block_id: int):
        assert self.blocks[block_id].ref_count == 0
        self.used_block_ids.remove(block_id)
        self.free_block_ids.append(block_id)

    def can_allocate(self, seq) -> bool:
        return len(self.free_block_ids) >= seq.num_blocks

    def allocate(self, seq):
        """Build a block table for a prefill, reusing prefix-cached blocks.

        Mirrors reference semantics (block_manager.py:59-82): only *full*
        blocks participate in the prefix cache; the first miss latches all
        later blocks to misses; hash hits are verified against stored token
        ids to guard collisions; a cached block may be revived off the free
        list if still resident.
        """
        assert not seq.block_table
        # bulk-hash all full blocks in one native call (csrc/nanovllm_core.cpp
        # nvt_chain_block_hashes; same chain as the reference's per-block loop)
        from nanovllm_tpu.utils.native import chain_block_hashes
        n_full = len(seq) // self.block_size
        full_hashes = chain_block_hashes(
            seq.token_ids[: n_full * self.block_size], self.block_size, -1)
        cache_miss = False
        for i in range(seq.num_blocks):
            token_ids = seq.block(i)
            h = full_hashes[i] if i < n_full else -1
            block_id = self.hash_to_block_id.get(h, -1)
            if block_id == -1 or self.blocks[block_id].token_ids != token_ids:
                cache_miss = True
            if cache_miss:
                block_id = self.free_block_ids[0]
                block = self._allocate_block(block_id)
            else:
                seq.num_cached_tokens += self.block_size
                if block_id in self.used_block_ids:
                    block = self.blocks[block_id]
                    block.ref_count += 1
                else:
                    block = self._allocate_block(block_id)
            if h != -1:
                block.update(h, token_ids)
                self.hash_to_block_id[h] = block_id
            seq.block_table.append(block_id)
        # A fully block-aligned prompt can be 100% cached, leaving a zero-token
        # prefill (latent in the reference, which never hits it because prompts
        # are rarely block-aligned). Always recompute at least the last token —
        # its KV rewrite is idempotent and the logits are needed for sampling.
        seq.num_cached_tokens = min(seq.num_cached_tokens, len(seq) - 1)

    def deallocate(self, seq):
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block_id)
        seq.num_cached_tokens = 0
        seq.block_table.clear()

    # ---------------------------------------------------------------- async
    # The async engine schedules K decode steps per device call, so block
    # capacity is reserved ahead of token materialization and prefix-cache
    # hashes are committed later, when the token values arrive (the reference
    # interleaves both in per-step may_append, block_manager.py:96-112).

    def _blocks_needed(self, seq, n: int) -> int:
        """Fresh blocks needed so the table covers positions up to
        ``num_sched_tokens - 1 + n - 1`` (n new KV positions from the next
        call; the final sampled token of a call stores no KV)."""
        cover = seq.num_sched_tokens - 1 + n
        return (cover + self.block_size - 1) // self.block_size - len(seq.block_table)

    def can_reserve(self, seq, n: int) -> bool:
        return self._blocks_needed(seq, n) <= len(self.free_block_ids)

    def reserve(self, seq, n: int):
        for _ in range(self._blocks_needed(seq, n)):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)

    def finalize_block(self, seq):
        """Commit the just-filled block's chained hash to the prefix cache.
        Called at token materialization when ``len(seq) % block_size == 0``;
        the filled block may not be the table's last (blocks are reserved
        ahead)."""
        idx = len(seq) // self.block_size - 1
        block = self.blocks[seq.block_table[idx]]
        if block.hash != -1:
            return  # prefix-cache hit blocks arrive pre-committed
        prefix = self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else -1
        h = compute_hash(seq.block(idx), prefix)
        block.update(h, seq.block(idx))
        self.hash_to_block_id[h] = block.block_id

    def can_append(self, seq) -> bool:
        # A new block is needed only on the step that crosses a block boundary
        # (reference: block_manager.py:93-94).
        return len(self.free_block_ids) >= (len(seq) % self.block_size == 1)

    def may_append(self, seq):
        """Per-decode-step block maintenance (reference: block_manager.py:96-112)."""
        block_table = seq.block_table
        last_block = self.blocks[block_table[-1]]
        pos = len(seq) % self.block_size
        if pos == 1:
            # previous step filled a block; start a new one
            assert last_block.hash != -1
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            block_table.append(block_id)
        elif pos == 0:
            # this step just filled the block: finalize + register its hash
            assert last_block.hash == -1
            token_ids = seq.block(seq.num_blocks - 1)
            prefix = self.blocks[block_table[-2]].hash if len(block_table) > 1 else -1
            h = compute_hash(token_ids, prefix)
            last_block.update(h, token_ids)
            self.hash_to_block_id[h] = last_block.block_id
        else:
            assert last_block.hash == -1
