"""Loader for the native engine core (csrc/nanovllm_core.cpp).

Compiles the C++ once per source hash into ``~/.cache/nanovllm_tpu`` and binds
it with ctypes (this image ships g++ but not pybind11). Every entry point has
a pure-Python fallback so the package works without a toolchain; the native
path removes the per-block Python hashing and per-seq store-table loops from
the scheduler hot path (cf. the reference's per-step O(batch) Python tax,
reference: nanovllm/engine/model_runner.py:244-250).
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc", "nanovllm_core.cpp")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NANOVLLM_TPU_NO_NATIVE"):
        return None
    src = _source_path()
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(os.path.expanduser("~/.cache/nanovllm_tpu"))
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"nanovllm_core_{tag}.so")
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.nvt_xxh64.restype = ctypes.c_uint64
        lib.nvt_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
        lib.nvt_chain_block_hashes.restype = ctypes.c_int64
        lib.nvt_chain_block_hashes.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint64)]
        lib.nvt_build_store_tables.restype = ctypes.c_int32
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        from hashlib import blake2b
        return int.from_bytes(blake2b(data, digest_size=8).digest(), "little")
    return lib.nvt_xxh64(data, len(data), seed)


def chain_block_hashes(tokens, block_size: int, prefix: int = -1):
    """Hashes of all full blocks in one call; tokens is a sequence of ints.
    Returns a list of Python ints (masked to 64 bits)."""
    toks = np.ascontiguousarray(tokens, dtype=np.int64)
    n_blocks = len(toks) // block_size
    if n_blocks == 0:
        return []
    lib = _load()
    if lib is None or block_size > 4096:
        from nanovllm_tpu.engine.block_manager import compute_hash
        out, h = [], prefix
        for b in range(n_blocks):
            h = compute_hash(toks[b * block_size:(b + 1) * block_size].tolist(), h)
            out.append(h)
        return out
    out = np.empty(n_blocks, np.uint64)
    done = lib.nvt_chain_block_hashes(
        toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(toks),
        block_size, prefix, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    assert done == n_blocks
    return [int(h) for h in out]


def build_store_tables_native(q_starts, q_lens, cached_lens, block_tables,
                              page_size, np_items, ns_items):
    """Native fast path of kv_store.build_store_tables; returns None when the
    native library is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    q_starts = np.ascontiguousarray(q_starts, np.int64)
    q_lens = np.ascontiguousarray(q_lens, np.int64)
    cached = np.ascontiguousarray(cached_lens, np.int64)
    tables = np.ascontiguousarray(block_tables, np.int32)
    page_src = np.zeros(np_items, np.int32)
    page_dst = np.zeros(np_items, np.int32)
    row_src = np.zeros(ns_items, np.int32)
    row_dst_page = np.zeros(ns_items, np.int32)
    row_dst_pos = np.zeros(ns_items, np.int32)
    counts = np.zeros(2, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.nvt_build_store_tables(
        q_starts.ctypes.data_as(i64p), q_lens.ctypes.data_as(i64p),
        cached.ctypes.data_as(i64p), tables.ctypes.data_as(i32p),
        ctypes.c_int64(len(q_lens)), ctypes.c_int64(tables.shape[1]),
        ctypes.c_int64(page_size), ctypes.c_int64(np_items),
        ctypes.c_int64(ns_items),
        page_src.ctypes.data_as(i32p), page_dst.ctypes.data_as(i32p),
        row_src.ctypes.data_as(i32p), row_dst_page.ctypes.data_as(i32p),
        row_dst_pos.ctypes.data_as(i32p), counts.ctypes.data_as(i32p))
    if rc != 0:
        return None
    return page_src, page_dst, row_src, row_dst_page, row_dst_pos, counts
