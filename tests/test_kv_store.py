"""KV-store kernel: pipelined page/row DMA writes into the pooled paged cache."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.ops.pallas.kv_store import build_store_tables, kv_store

PS = 16   # page size
HK2 = 4   # combined kv heads (2*Hk)
D = 128


def _run(kv_pages, kv_new, tables_args):
    return np.asarray(kv_store(
        jnp.asarray(kv_pages), jnp.asarray(kv_new),
        *[jnp.asarray(a) for a in tables_args], page_size=PS, interpret=True))


def test_prefill_page_copies_and_decode_rows():
    rng = np.random.default_rng(0)
    num_pages = 32
    kv_pages = rng.standard_normal((num_pages, PS, HK2, D)).astype(np.float32)
    # three seqs: prefill 40 tokens (3 pages), prefill 16 (1 page), decode 1 row
    q_starts = np.array([0, 40, 56], np.int64)
    q_lens = np.array([40, 16, 1], np.int64)
    cached = np.array([0, 0, 33], np.int64)
    block_tables = np.zeros((3, 4), np.int32)
    block_tables[0, :3] = [5, 9, 2]
    block_tables[1, :1] = [7]
    block_tables[2, :3] = [11, 12, 13]  # decode token at pos 33 → page 13 pos 1
    T = 57
    Tpad = T + PS
    kv_new = rng.standard_normal((Tpad, HK2, D)).astype(np.float32)

    args = build_store_tables(q_starts, q_lens, cached, block_tables, PS,
                              np_items=8, ns_items=4)
    out = _run(kv_pages, kv_new, args)

    # seq 0: 40 tokens → pages 5,9 full, page 2 rows 0..7 (+ over-read 8..15)
    np.testing.assert_array_equal(out[5], kv_new[0:16])
    np.testing.assert_array_equal(out[9], kv_new[16:32])
    np.testing.assert_array_equal(out[2], kv_new[32:48])  # over-read rows OK
    # seq 1: 16 tokens → page 7 full
    np.testing.assert_array_equal(out[7], kv_new[40:56])
    # seq 2: single row at page 13 pos 1
    np.testing.assert_array_equal(out[13, 1], kv_new[56])
    # untouched pages unchanged
    np.testing.assert_array_equal(out[0], kv_pages[0])
    np.testing.assert_array_equal(out[13, 0], kv_pages[13, 0])
    np.testing.assert_array_equal(out[13, 2:], kv_pages[13, 2:])


def test_recompute_last_token_is_row_write():
    rng = np.random.default_rng(1)
    kv_pages = np.zeros((8, PS, HK2, D), np.float32)
    # fully-cached prompt: cached = len-1 = 20, one recomputed token at pos 20
    q_starts = np.array([0], np.int64)
    q_lens = np.array([1], np.int64)
    cached = np.array([20], np.int64)
    block_tables = np.array([[3, 6, 0, 0]], np.int32)
    kv_new = rng.standard_normal((1 + PS, HK2, D)).astype(np.float32)
    args = build_store_tables(q_starts, q_lens, cached, block_tables, PS, 4, 4)
    out = _run(kv_pages, kv_new, args)
    np.testing.assert_array_equal(out[6, 4], kv_new[0])  # pos 20 → page 6 pos 4
    assert np.all(out[3] == 0)


def test_many_items_exercise_sem_ring():
    """More items than the DMA ring depth (NSEM=8)."""
    rng = np.random.default_rng(2)
    B = 24
    kv_pages = np.zeros((80, PS, HK2, D), np.float32)
    q_starts = np.arange(B, dtype=np.int64)
    q_lens = np.ones(B, np.int64)
    cached = rng.integers(0, 40, B)
    block_tables = rng.permutation(80)[:B * 3].reshape(B, 3).astype(np.int32)
    kv_new = rng.standard_normal((B + PS, HK2, D)).astype(np.float32)
    args = build_store_tables(q_starts, q_lens, cached, block_tables, PS, 4, 32)
    out = _run(kv_pages, kv_new, args)
    for i in range(B):
        pos = int(cached[i])
        page = block_tables[i, pos // PS]
        np.testing.assert_array_equal(out[page, pos % PS], kv_new[i])


def test_rows_merge_aligned_window():
    """kv_store_rows_merge: single-row writes into a pool whose token dim is
    the second-minor (the int8 scale sidecar) via 8-row read-merge-write."""
    import jax.numpy as jnp
    from nanovllm_tpu.ops.pallas.kv_store import kv_store_rows_merge

    rng = np.random.default_rng(5)
    pool = rng.integers(-100, 100, (8, 16, 128)).astype(np.int8)
    rows = rng.integers(-100, 100, (24, 128)).astype(np.int8)
    src = np.asarray([3, 7, 11, 23, 0], np.int32)
    pages = np.asarray([1, 4, 6, 2, 7], np.int32)
    pos = np.asarray([5, 0, 15, 8, 7], np.int32)
    out = np.asarray(kv_store_rows_merge(
        jnp.asarray(pool), jnp.asarray(rows), jnp.asarray(src),
        jnp.asarray(pages), jnp.asarray(pos), interpret=True))
    ref = pool.copy()
    for j in range(len(src)):
        ref[pages[j], pos[j]] = rows[src[j]]
    np.testing.assert_array_equal(out, ref)

    # n_rows gates trailing (zero-padded) table entries
    out2 = np.asarray(kv_store_rows_merge(
        jnp.asarray(pool), jnp.asarray(rows), jnp.asarray(src),
        jnp.asarray(pages), jnp.asarray(pos), n_rows=2, interpret=True))
    ref2 = pool.copy()
    for j in range(2):
        ref2[pages[j], pos[j]] = rows[src[j]]
    np.testing.assert_array_equal(out2, ref2)
