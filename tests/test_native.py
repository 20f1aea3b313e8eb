"""Native engine core (csrc/nanovllm_core.cpp): the in-repo XXH64 must match
the reference's xxhash library bit-for-bit, the bulk chained block hasher must
match the per-block Python loop, and the native store-table builder must match
the Python implementation."""

import numpy as np
import pytest

from nanovllm_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_xxh64_matches_xxhash_library():
    xxhash = pytest.importorskip("xxhash")
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 4, 7, 8, 17, 31, 32, 33, 63, 100, 1000, 4096):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert native.xxh64(data) == xxhash.xxh64(data).intdigest(), n
    assert native.xxh64(b"hello", seed=42) == xxhash.xxh64(b"hello", seed=42).intdigest()


def test_chain_block_hashes_matches_python_loop():
    from nanovllm_tpu.engine.block_manager import compute_hash
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 150000, size=64).tolist()
    bs = 16
    got = native.chain_block_hashes(tokens, bs, -1)
    h = -1
    want = []
    for b in range(len(tokens) // bs):
        h = compute_hash(tokens[b * bs:(b + 1) * bs], h)
        want.append(h)
    assert got == want


def test_build_store_tables_native_matches_python(monkeypatch):
    from nanovllm_tpu.ops.pallas import kv_store

    q_starts = np.array([0, 40, 41], np.int64)
    q_lens = np.array([40, 1, 23], np.int64)
    cached = np.array([16, 99, 8], np.int64)
    tables = np.zeros((3, 16), np.int32)
    tables[0, :8] = [3, 5, 7, 9, 11, 13, 15, 17]
    tables[1, :14] = np.arange(20, 34)
    tables[2, :4] = [2, 4, 6, 8]
    args = (q_starts, q_lens, cached, tables, 8, 16, 8)
    got = native.build_store_tables_native(*args)
    assert got is not None
    monkeypatch.setenv("NANOVLLM_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    want = kv_store.build_store_tables(*args)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_block_manager_prefix_cache_with_native_hashes():
    """allocate() bulk-hash path: identical prompts share blocks."""
    from nanovllm_tpu.engine.block_manager import BlockManager
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams

    bm = BlockManager(32, 8)
    toks = list(range(1000, 1033))
    a = Sequence(toks, SamplingParams(), block_size=8)
    b = Sequence(toks, SamplingParams(), block_size=8)
    bm.allocate(a)
    bm.allocate(b)
    assert b.num_cached_tokens == 32
    assert a.block_table[:4] == b.block_table[:4]
