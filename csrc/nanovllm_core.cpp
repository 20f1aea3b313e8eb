// Native engine core: host-side hot paths of the block manager / batch prep.
//
// The reference leans on two native host libraries: the xxhash C extension for
// prefix-cache block hashing (reference: nanovllm/engine/block_manager.py:2,37)
// and safetensors for weight IO. Here the hashing path is implemented natively
// in-repo — XXH64 (from the public xxHash spec) plus a whole-sequence chained
// block hasher — and the per-prefill KV store-table construction
// (reference slot_mapping building, nanovllm/engine/model_runner.py:203-209)
// is a single C call instead of a Python loop.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this image);
// see nanovllm_tpu/utils/native.py for the loader and the pure-Python
// fallbacks used when no compiler is available.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr uint64_t P1 = 11400714785074694791ULL;
constexpr uint64_t P2 = 14029467366897019727ULL;
constexpr uint64_t P3 = 1609587929392839161ULL;
constexpr uint64_t P4 = 9650029242287828579ULL;
constexpr uint64_t P5 = 2870177450012600261ULL;

inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;  // little-endian hosts only (x86-64 / aarch64)
}

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint64_t round1(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  return acc * P1;
}

inline uint64_t merge_round(uint64_t acc, uint64_t val) {
  acc ^= round1(0, val);
  return acc * P1 + P4;
}

uint64_t xxh64_impl(const uint8_t* p, size_t len, uint64_t seed) {
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2;
    uint64_t v2 = seed + P2;
    uint64_t v3 = seed;
    uint64_t v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = round1(v1, read64(p)); p += 8;
      v2 = round1(v2, read64(p)); p += 8;
      v3 = round1(v3, read64(p)); p += 8;
      v4 = round1(v4, read64(p)); p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge_round(h, v1);
    h = merge_round(h, v2);
    h = merge_round(h, v3);
    h = merge_round(h, v4);
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    h ^= round1(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

}  // namespace

extern "C" {

uint64_t nvt_xxh64(const uint8_t* data, size_t len, uint64_t seed) {
  return xxh64_impl(data, len, seed);
}

// Chained block hashes over a token stream (reference semantics:
// block_manager.py:35-41 — each full block's hash commits to its whole
// prefix via the previous hash as an 8-byte little-endian header).
// tokens: int64[num_tokens]; out: uint64[num_tokens / block_size].
// prefix: hash of the block before tokens[0] (-1 == no prefix).
// Returns the number of full blocks hashed.
int64_t nvt_chain_block_hashes(const int64_t* tokens, int64_t num_tokens,
                               int64_t block_size, int64_t prefix,
                               uint64_t* out) {
  int64_t n_blocks = num_tokens / block_size;
  uint64_t h = (uint64_t)prefix;
  // buffer: 8-byte prefix + block_size int64 tokens
  // (matches Python: prefix.to_bytes(8,'little') + tokens.tobytes())
  for (int64_t b = 0; b < n_blocks; ++b) {
    const uint8_t* tok_bytes = (const uint8_t*)(tokens + b * block_size);
    // hash prefix header and token payload as one contiguous message
    uint8_t head[8];
    std::memcpy(head, &h, 8);
    // XXH64 over concat(head, tok_bytes) without materializing the concat:
    // fall back to a small stack buffer (block payloads are contiguous, the
    // 8-byte header is not) — copy is cheap relative to hashing.
    // Max block_size supported without heap: 4096 tokens.
    uint8_t buf[8 + 4096 * 8];
    size_t payload = (size_t)block_size * 8;
    if (payload > sizeof(buf) - 8) return b;  // caller falls back to Python
    std::memcpy(buf, head, 8);
    std::memcpy(buf + 8, tok_bytes, payload);
    h = xxh64_impl(buf, payload + 8, 0);
    out[b] = h;
  }
  return n_blocks;
}

// KV store-table construction for a ragged prefill batch
// (see nanovllm_tpu/ops/pallas/kv_store.py:build_store_tables).
// Inputs per sequence i: q_starts/q_lens/cached_lens int64[n]; block_tables
// int32[n, table_width] row-major. Outputs: page_src/page_dst int32[np_cap],
// row_src/row_dst_page/row_dst_pos int32[ns_cap], counts int32[2].
// Returns 0 on success, -1 on capacity overflow or alignment violation.
int32_t nvt_build_store_tables(
    const int64_t* q_starts, const int64_t* q_lens, const int64_t* cached_lens,
    const int32_t* block_tables, int64_t n_seqs, int64_t table_width,
    int64_t page_size, int64_t np_cap, int64_t ns_cap,
    int32_t* page_src, int32_t* page_dst,
    int32_t* row_src, int32_t* row_dst_page, int32_t* row_dst_pos,
    int32_t* counts) {
  int64_t np_count = 0, ns_count = 0;
  for (int64_t i = 0; i < n_seqs; ++i) {
    int64_t qlen = q_lens[i];
    if (qlen == 0) continue;
    const int32_t* table = block_tables + i * table_width;
    if (qlen == 1) {
      int64_t pos = cached_lens[i];
      if (ns_count >= ns_cap) return -1;
      row_src[ns_count] = (int32_t)q_starts[i];
      row_dst_page[ns_count] = table[pos / page_size];
      row_dst_pos[ns_count] = (int32_t)(pos % page_size);
      ++ns_count;
      continue;
    }
    if (cached_lens[i] % page_size != 0) return -1;
    int64_t first_page = cached_lens[i] / page_size;
    int64_t n_pages = (qlen + page_size - 1) / page_size;
    for (int64_t j = 0; j < n_pages; ++j) {
      if (np_count >= np_cap) return -1;
      page_src[np_count] = (int32_t)(q_starts[i] + j * page_size);
      page_dst[np_count] = table[first_page + j];
      ++np_count;
    }
  }
  counts[0] = (int32_t)np_count;
  counts[1] = (int32_t)ns_count;
  return 0;
}

}  // extern "C"
