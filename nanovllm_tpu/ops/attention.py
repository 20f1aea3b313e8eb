"""Paged attention: unified metadata, KV store, and attention dispatch.

The reference splits attention across two flash-attn CUDA entry points plus a
Triton store kernel and a process-global metadata Context (reference:
nanovllm/layers/attention.py:10-96, nanovllm/utils/context.py:5-27). Here:

- **One metadata pytree** (``AttnMeta``) describes any batch — prefill,
  decode, or mixed — as a ragged q stream over paged KV. It is an explicit
  jit argument (globals don't trace).
- **One pooled page cache** holds every layer's K and V:
  ``kv_pages [L * pages_per_layer, page_size, 2*Hk, D]`` with K at even and
  V at odd combined-head indices. Layer l's physical page = logical page +
  l * pages_per_layer, so the scan over layers passes the whole donated
  buffer (no per-layer slicing/copies) and kernels receive a plain 4D array.
- **Store** is the custom Pallas kernel (ops/pallas/kv_store.py) — XLA
  scatter costs ~3.5 ms/call on v5e, which at 28 layers/step was the single
  largest cost in the engine.
- **Attention** dispatch:
    * ``ragged``  — the tuned in-tree Pallas kernel
      (jax.experimental.pallas.ops.tpu.ragged_paged_attention), the library
      analogue of the reference's flash-attn dependency; handles mixed
      prefill+decode batches natively.
    * ``xla``     — masked-softmax reference implementation (runs anywhere;
      used for CPU tests and as the numeric oracle).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


class AttnMeta(NamedTuple):
    """Unified ragged-batch metadata (host-built, padded to static buckets).

    T = padded q-token count, B = max sequences, W = page-table width,
    NP/NS = static store-item capacities.
    """

    positions: jax.Array        # i32[T] position of each new token (0 at pad)
    q_segment_ids: jax.Array    # i32[T] sequence index per token; -1 = pad
    kv_lens: jax.Array          # i32[B] total context per seq (cached + new)
    page_indices: jax.Array     # i32[B, W] logical page ids
    cu_q_lens: jax.Array        # i32[B+1] cumulative q lengths
    num_seqs: jax.Array         # i32[1]
    last_token_idx: jax.Array   # i32[B] index into [T] of each seq's last token
    temperatures: jax.Array     # f32[B]
    slot_ids: jax.Array         # i32[B] persistent sequence slot (last_tokens row)
    top_ks: jax.Array           # i32[B] 0 = disabled
    top_ps: jax.Array           # f32[B] 1.0 = disabled
    # store tables (ops/pallas/kv_store.py)
    store_page_src: jax.Array   # i32[NP]
    store_page_dst: jax.Array   # i32[NP] logical page ids
    store_row_src: jax.Array    # i32[NS]
    store_row_dst_page: jax.Array  # i32[NS] logical page ids
    store_row_dst_pos: jax.Array   # i32[NS]
    store_counts: jax.Array     # i32[2]
    # mixed prefill+decode batches: per-seq source slot of the input token
    # (-1 = tokens came in the host upload; >= 0 = gather the lane's single
    # input token from the device-resident last_tokens buffer — the token
    # may not be materialized on the host yet)
    input_src_slot: jax.Array | None = None   # i32[B]


class DecodeMeta(NamedTuple):
    """Host-built metadata for a multi-step decode call (engine hot loop).

    The per-step ``AttnMeta`` is derived from this *on device* inside the
    ``lax.scan`` over decode steps (engine/model_runner.py:_decode_steps) —
    the host round trip per token that serializes GPU-style engines becomes
    one metadata upload per K steps.
    """

    slot_ids: jax.Array       # i32[B] row of each seq in the last_tokens buffer
    kv_lens: jax.Array        # i32[B] tokens already in KV (= position of next)
    page_indices: jax.Array   # i32[B, W] logical page ids
    steps_left: jax.Array     # i32[B] how many of the K steps each seq runs
    temperatures: jax.Array   # f32[B]
    num_seqs: jax.Array       # i32[1]
    top_ks: jax.Array         # i32[B] 0 = disabled
    top_ps: jax.Array         # f32[B] 1.0 = disabled


class DenseMeta(NamedTuple):
    """Cache-free teacher-forcing attention over a single contiguous stream
    (the reference's SimpleAttention eval backend,
    nanovllm/layers/attention.py:78-96). No KV store, plain causal mask."""

    positions: jax.Array  # i32[T]


def combine_kv(k, v):
    """[T, Hk, D] x2 → [T, 2Hk, D] with K at even, V at odd combined heads
    (the layout the ragged-paged-attention kernel reads)."""
    T, Hk, D = k.shape
    return jnp.stack([k, v], axis=2).reshape(T, 2 * Hk, D)


# Per-(row, head) KV scales are stored LOG-ENCODED in an int8 sidecar:
# e = ceil(8 * log2(scale)) clamped to ±127, dequantized as 2^(e/8).
# Why: TPU HBM arrays physically pad the minor dim to 128 lanes (a
# [ps, 2Hk=16] f32 page occupies — and DMAs — [ps, 128] f32 bytes; Mosaic
# rejects sub-128 slices of the padded memref), so a "slim" narrow sidecar
# saves nothing, and an f32 row's 128 mandatory lanes cost 512 B for 64
# useful bytes (33% of int4 decode traffic, measured round 4). An int8 row
# costs 128 B — 4x slimmer — and the ceil rounding makes the stored scale
# >= the exact absmax scale, so quantization never clips; the step 2^(1/8)
# adds at most 9% (mean ~4.4%) to the rounding noise, gated by the
# engine-level logit-KL tests (tests/test_kv_quality.py).
KV_SCALE_STEP = 0.125       # e counts eighths of an octave
_KV_SCALE_EMAX = 127        # scale range 2^(±127/8) ≈ [1.6e-5, 6.1e4]


def kv_scale_width(num_combined_heads: int) -> int:
    """Stored lane width of one int8 sidecar scale row (the 128-lane
    physical minimum; lanes [0:2Hk] hold the log-encoded scales in
    interleaved head order K0 V0 K1 V1 ..., the rest are padding)."""
    assert num_combined_heads <= 128
    return 128


def encode_kv_scales(scales):
    """f32 scales [..., 2Hk] → (e int8 [..., 128] lane-padded, decoded f32
    scales [..., 2Hk]). The DECODED value (2^(e/8) >= scales) must be used
    for quantizing the data so store and kernel agree exactly.

    The int8 row is the densest Mosaic-sliceable token row (128 B vs the
    round-4 f32 row's 512 B); its (8,128)(4,1) tiling forbids UNALIGNED
    dynamic offsets on the token dim, which the store side satisfies by
    8-aligning prefill stream segments (ModelRunner.prepare pads per-seq
    q-lens) and doing single-row writes as read-merge-write on 8-row
    windows (ops/pallas/kv_store.py)."""
    e = jnp.clip(jnp.ceil(jnp.log2(scales) * (1.0 / KV_SCALE_STEP)),
                 -_KV_SCALE_EMAX, _KV_SCALE_EMAX)
    decoded = jnp.exp2(e * KV_SCALE_STEP)
    sw = kv_scale_width(scales.shape[-1])
    pad = [(0, 0)] * (scales.ndim - 1) + [(0, sw - scales.shape[-1])]
    return jnp.pad(e.astype(jnp.int8), pad), decoded


def take_kv_scales(stored, num_combined_heads: int):
    """int8 e-rows [..., 128] → decoded f32 scales [..., 2Hk]."""
    e = stored[..., :num_combined_heads].astype(jnp.float32)
    return jnp.exp2(e * KV_SCALE_STEP)


def quantize_kv(kv_new, kv_quant: tuple):
    """Quantize combined K/V rows for a low-bit page pool.

    kv_quant = ("int8", scale): stored = round(x / scale) clamped to ±127,
    dequantized in the attention kernel as stored * scale (one global scale —
    the granularity the in-tree kernel's k_scale/v_scale supports).
    ("fp8", 1.0): plain e4m3 cast (scale-free). An extension beyond the
    reference, which reserves kv-cache dtype config but never implements it.

    ("int8_rs"|"int4_rs", _): dynamic per-(row, head) scales — returns
    (stored, e-rows int8[T, 128] log-encoded, see encode_kv_scales). The rs
    pools keep the dense pools' **interleaved** combined-head axis (K at
    even, V at odd indices) so every pool shards identically on the head
    axis under TP (parallel/sharding.kv_sharding).
    int4_rs packs a head pair's values as one int8 byte b = 16*V + K
    (K, V in [-7, 7], uniquely decodable) — the packed row [Hk, D] keeps the
    full 128-lane minor dim Mosaic's DMA slicer requires.
    Per-row scales remove the global-scale clipping hazard on unnormalized V
    rows; the ceil'd log encoding preserves that (stored scale >= absmax
    scale, never clips)."""
    kind, scale = kv_quant
    if kind == "int8":
        q = jnp.round(kv_new.astype(jnp.float32) * (1.0 / scale))
        return jnp.clip(q, -127, 127).astype(jnp.int8)
    if kind == "fp8":
        return kv_new.astype(jnp.float8_e4m3fn)
    if kind in ("int8_rs", "int4_rs"):
        x = kv_new.astype(jnp.float32)                  # [T, 2Hk, D]
        qmax = 127.0 if kind == "int8_rs" else 7.0
        absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-8)  # [T, 2Hk]
        e_rows, dec = encode_kv_scales(absmax * (1.0 / qmax))
        qv = jnp.clip(jnp.round(x * (1.0 / dec[..., None])),
                      -qmax, qmax).astype(jnp.int8)
        if kind == "int4_rs":
            k, v = qv[..., 0::2, :], qv[..., 1::2, :]   # [T, Hk, D] each
            qv = (16 * v + k).astype(jnp.int8)          # b in [-119, 119]
        return qv, e_rows
    raise ValueError(f"unknown kv_quant kind {kind!r}")


def unpack_int4(packed):
    """KV-packed bytes b = 16*V + K [..., Hk, D] → interleaved combined rows
    [..., 2Hk, D] int8 (K at even, V at odd indices)."""
    b = packed.astype(jnp.int32)
    v = (b + 8) >> 4                 # = round-to-floor((b + 8) / 16)
    k = b - 16 * v
    kv = jnp.stack([k, v], axis=-2)  # [..., Hk, 2, D]
    shape = packed.shape[:-2] + (2 * packed.shape[-2], packed.shape[-1])
    return kv.reshape(shape).astype(jnp.int8)


def store_kv(kv_pages, kv_new, meta: AttnMeta, layer_idx, *, page_size: int,
             pages_per_layer: int, interpret: bool = False):
    """Write new combined K/V rows into layer ``layer_idx``'s pages.

    Static dispatch on the meta shape: a decode-scan meta carries a
    length-1 (dummy) page-copy table — all its writes are single rows —
    and takes the unrolled row-store kernel; prefill metas take the general
    ring kernel with full-page copies.

    Row-scale KV modes pass tuples: kv_pages = (pages, int8 e-scale pool
    [P, ps, 128]) and kv_new = (rows, e-rows int8 [T, 128], see
    encode_kv_scales); the same store kernels move both (they are
    layout-generic over the trailing dims and dtypes)."""
    from nanovllm_tpu.ops.pallas.kv_store import (kv_store, kv_store_rows,
                                                  kv_store_rows_merge)
    off = layer_idx * pages_per_layer
    if isinstance(kv_pages, tuple):
        pages, spool = kv_pages
        rows, srows = kv_new
        pages = store_kv(pages, rows, meta, layer_idx, page_size=page_size,
                         pages_per_layer=pages_per_layer, interpret=interpret)
        # The int8 scale sidecar's token dim is the second-minor, which
        # Mosaic only slices at 8-aligned offsets: page runs are aligned
        # (prepare pads per-seq segments to 8), single rows go through the
        # aligned-window merge kernel.
        if meta.store_page_src.shape[0] == 1:
            spool = kv_store_rows_merge(
                spool, srows, meta.store_row_src,
                meta.store_row_dst_page + off, meta.store_row_dst_pos,
                interpret=interpret)
        else:
            spool = kv_store(
                spool, srows,
                meta.store_page_src, meta.store_page_dst + off,
                meta.store_row_src, meta.store_row_dst_page + off,
                meta.store_row_dst_pos,
                meta.store_counts * jnp.array([1, 0], jnp.int32),
                page_size=page_size, interpret=interpret, with_rows=False)
            spool = kv_store_rows_merge(
                spool, srows, meta.store_row_src,
                meta.store_row_dst_page + off, meta.store_row_dst_pos,
                n_rows=meta.store_counts[1], interpret=interpret)
        return pages, spool
    if meta.store_page_src.shape[0] == 1:
        return kv_store_rows(
            kv_pages, kv_new, meta.store_row_src,
            meta.store_row_dst_page + off, meta.store_row_dst_pos,
            interpret=interpret)
    return kv_store(
        kv_pages, kv_new,
        meta.store_page_src, meta.store_page_dst + off,
        meta.store_row_src, meta.store_row_dst_page + off,
        meta.store_row_dst_pos, meta.store_counts,
        page_size=page_size, interpret=interpret)


def paged_attention(q, kv_pages, meta: AttnMeta, layer_idx, scale, *,
                    impl: str, page_size: int, pages_per_layer: int,
                    blocks: tuple | None = None, kv_quant: tuple | None = None,
                    interpret: bool = False):
    """Ragged attention of the q stream against layer ``layer_idx``'s pages.

    ``blocks``: optional (num_kv_pages_per_block, num_queries_per_block)
    override for the ragged kernels (the library's auto-tune table has no
    entries for this GQA shape on v5e). ``kv_quant``: ("int8"|"fp8", scale)
    when the page pool is quantized — the kernel dequantizes in-VMEM; the
    row-scale modes ("int8_rs"/"int4_rs") carry a (pages, scales) tuple
    pool, served prefill AND decode by the in-house quantized ragged kernel
    (ops/pallas/ragged_quant.py). ``impl="flash"`` prefers the in-house
    kernel for dense int8 pools too (measured 0.99x the library kernel at
    the serving decode shape, with int8-MXU matmuls)."""
    kind = kv_quant[0] if kv_quant is not None else None
    kv_scales = None
    if isinstance(kv_pages, tuple):
        kv_pages, kv_scales = kv_pages
    page_indices = meta.page_indices + layer_idx * pages_per_layer
    is_decode = meta.store_page_src.shape[0] == 1  # decode-scan meta shape
    kv_scale = (kv_quant[1] if kv_quant is not None
                and kind not in ("int8_rs", "int4_rs") else None)
    # The in-house kernel can serve EVERY pool — bf16, fp8, int8, int8_rs,
    # int4 — completing SURVEY §2.9's "the build writes the kernel itself"
    # for both reference flash-attn entry points (reference:
    # nanovllm/layers/attention.py:67-74). Default routing follows the
    # measured mixed-context A/B (tools/ragged_quant_validate.py decode
    # mixed): rs pools (their only non-oracle reader) and bf16 pools
    # (in-house (8,8) = 0.83x the tuned library bf16 wall) go in-house;
    # dense int8/fp8 stay on the library kernel (in-house 1.18x there —
    # the per-block p-requant chain dominates at short contexts) unless
    # impl="flash" opts in. Geometry gate: head_dim 128 (every supported
    # model family's value); impl="library" keeps the jax.experimental
    # kernel reachable for A/B and exotic head dims.
    kv_mode = {None: "bf16", "fp8": "fp8", "int8": "int8",
               "int8_rs": "int8_rs", "int4_rs": "int4_rs"}[kind]
    in_house = impl in ("ragged", "flash") and q.shape[-1] == 128 and (
        (kind is None and kv_pages.dtype == jnp.bfloat16)
        or (impl == "flash" and kind in ("int8", "fp8")))
    if kv_scales is not None and impl != "xla":
        in_house = True  # rs pools have no other non-oracle reader
    if in_house and impl != "xla":
        from nanovllm_tpu.ops.pallas.ragged_quant import ragged_quant_attention
        bkv, bq = blocks if blocks is not None else (16, 8 if is_decode
                                                     else 256)
        return ragged_quant_attention(
            q, kv_pages, meta.kv_lens, page_indices, meta.cu_q_lens,
            meta.num_seqs, kv_scales, sm_scale=scale, kv_mode=kv_mode,
            kv_scale=None if kv_scales is not None else kv_scale,
            num_kv_pages_per_block=bkv, num_queries_per_block=bq,
            interpret=interpret)
    # library ragged kernel (escape hatch / exotic head dims); prefill must
    # NEVER fall through to the O(T*B*W*ps)-memory XLA oracle on TPU.
    if impl in ("ragged", "flash", "library"):
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention)
        bkv, bq = blocks if blocks is not None else (None, None)
        if bkv is not None:
            # tuned for serving shapes; clamp to this call's geometry (the
            # kernel requires bkv <= pages-per-seq and bq <= q tokens)
            bkv = min(bkv, meta.page_indices.shape[1])
            bq = min(bq, q.shape[0])
        return ragged_paged_attention(
            q, kv_pages, meta.kv_lens, page_indices, meta.cu_q_lens,
            meta.num_seqs, sm_scale=scale,
            k_scale=kv_scale, v_scale=kv_scale,
            num_kv_pages_per_block=bkv, num_queries_per_block=bq,
            vmem_limit_bytes=100 * 2**20)
    return _paged_attention_xla(q, kv_pages, meta, page_indices, scale,
                                page_size=page_size, kv_scale=kv_scale,
                                kv_scales=kv_scales,
                                packed_int4=kind == "int4_rs")


def _paged_attention_xla(q, kv_pages, meta: AttnMeta, page_indices, scale, *,
                         page_size: int, kv_scale: float | None = None,
                         kv_scales=None, packed_int4: bool = False):
    """Masked-softmax oracle over the paged cache. O(T * B * W * ps) memory —
    for tests and small shapes only."""
    T, Hq, D = q.shape
    B, W = page_indices.shape
    Hk2 = kv_pages.shape[2] * (2 if packed_int4 else 1)
    Hk = Hk2 // 2
    G = Hq // Hk
    S = W * page_size
    rows = jnp.take(kv_pages, page_indices.reshape(-1), axis=0)  # [B*W, ps, {2Hk,Hk}, Dp]
    if packed_int4:
        rows = unpack_int4(rows)
    rows = rows.reshape(B, S, Hk2, D).astype(jnp.float32)
    if kv_scale is not None:
        rows = rows * kv_scale
    if kv_scales is not None:  # per-(row, head) log-encoded sidecar scales
        srow = take_kv_scales(
            jnp.take(kv_scales, page_indices.reshape(-1), axis=0), Hk2)
        rows = rows * srow.reshape(B, S, Hk2, 1).astype(jnp.float32)
    # every pool interleaves combined heads (K at even, V at odd)
    k = rows[:, :, 0::2, :]
    v = rows[:, :, 1::2, :]
    seg = jnp.clip(meta.q_segment_ids, 0, B - 1)
    kt = jnp.take(k, seg, axis=0)                 # [T, S, Hk, D]
    vt = jnp.take(v, seg, axis=0)
    qg = q.reshape(T, Hk, G, D).astype(jnp.float32)
    s = jnp.einsum("thgd,tshd->thgs", qg, kt) * scale   # [T, Hk, G, S]
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, :]    # [1, S]
    qpos = meta.positions[:, None]
    valid = (meta.q_segment_ids[:, None] >= 0) & (kv_pos <= qpos) \
        & (kv_pos < jnp.take(meta.kv_lens, seg, axis=0)[:, None])
    s = jnp.where(valid[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("thgs,tshd->thgd", p, vt)
    return o.reshape(T, Hq, D).astype(q.dtype)


# ------------------------------------------------------------------ dense
def _gqa_scores(q, k):
    """q [T, Hq, D] x k [Tk, Hk, D] -> scores [Hq, T, Tk] with GQA grouping."""
    T, Hq, D = q.shape
    Hk = k.shape[1]
    G = Hq // Hk
    qg = q.reshape(T, Hk, G, D).astype(jnp.float32)
    s = jnp.einsum("thgd,shd->hgts", qg, k.astype(jnp.float32))
    return s.reshape(Hk * G, T, -1)


def _gqa_out(probs, v, Hq):
    Hk = v.shape[1]
    G = Hq // Hk
    p = probs.reshape(Hk, G, probs.shape[1], probs.shape[2])
    o = jnp.einsum("hgts,shd->thgd", p, v.astype(jnp.float32))
    return o.reshape(o.shape[0], Hq, -1)


def dense_attention(q, k, v, positions, scale: float, *, impl="xla"):
    """Plain causal attention over one stream: q/k/v [T, H*, D]."""
    s = _gqa_scores(q, k) * scale
    causal = positions[None, :] <= positions[:, None]
    s = jnp.where(causal[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return _gqa_out(p, v, q.shape[1]).astype(q.dtype)
