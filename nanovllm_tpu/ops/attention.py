"""Paged-KV attention ops: metadata pytrees, KV store, prefill + decode kernels.

The reference outsources these to flash-attn CUDA kernels plus a Triton scatter
(reference: nanovllm/layers/attention.py:10-96). Here:

- ``store_kv``: scatter new K/V rows into the flat-slot paged cache (the
  Triton ``store_kvcache_kernel`` equivalent). Implemented with
  ``.at[slots].set`` under buffer donation — XLA performs it in place; padding
  slots (-1) are remapped out of bounds and dropped.
- ``prefill_attention``: ragged causal attention of the concatenated new-token
  stream against each sequence's full K/V (prefix-cached + new), read from the
  paged cache (flash_attn_varlen_func equivalent).
- ``decode_attention``: one query token per sequence against the paged cache
  via block tables (flash_attn_with_kvcache equivalent).

Each has an XLA reference implementation (masked softmax — correct everywhere,
O(T·Tk) memory) and a Pallas TPU kernel (ops/pallas/) selected via ``impl``.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PrefillMeta(NamedTuple):
    """Ragged prefill batch metadata (host-built, padded to static buckets).

    T = padded new-token count, Tk = padded key-token count (cached + new),
    B = max sequences per batch. Equivalent of the reference's global Context
    for prefill (reference: nanovllm/utils/context.py:5-27,
    model_runner.py:182-237) — but passed explicitly as a jit argument.
    """

    positions: jax.Array       # i32[T]  position of each new token (0 at pad)
    q_segment_ids: jax.Array   # i32[T]  sequence index per new token; -1 = pad
    slot_mapping: jax.Array    # i32[T]  flat KV slot per new token; -1 = pad
    k_slots: jax.Array         # i32[Tk] flat KV slots of all context tokens; 0 at pad
    k_segment_ids: jax.Array   # i32[Tk] sequence index per context token; -1 = pad
    k_positions: jax.Array     # i32[Tk] position of each context token
    last_token_idx: jax.Array  # i32[B]  index into [T] of each seq's last token; 0 at pad
    temperatures: jax.Array    # f32[B]


class DecodeMeta(NamedTuple):
    """Decode batch metadata: one new token per sequence
    (reference: nanovllm/engine/model_runner.py:239-270)."""

    positions: jax.Array       # i32[B]
    slot_mapping: jax.Array    # i32[B] flat slot of the new token; -1 = pad
    block_tables: jax.Array    # i32[B, W]
    context_lens: jax.Array    # i32[B] total tokens incl. the new one; 0 = pad
    temperatures: jax.Array    # f32[B]


class DenseMeta(NamedTuple):
    """Cache-free teacher-forcing attention over a single contiguous stream
    (the reference's SimpleAttention eval backend,
    nanovllm/layers/attention.py:78-96). No KV store, plain causal mask."""

    positions: jax.Array  # i32[T]


def dense_attention(q, k, v, positions, scale: float, *, impl="xla"):
    """Plain causal attention over one stream: q/k/v [T, H*, D]."""
    if impl == "pallas":
        from nanovllm_tpu.ops.pallas.flash_prefill import flash_dense
        return flash_dense(q, k, v, positions, scale)
    s = _gqa_scores(q, k) * scale
    causal = positions[None, :] <= positions[:, None]
    s = jnp.where(causal[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return _gqa_out(p, v, q.shape[1]).astype(q.dtype)


def store_kv(k_caches, v_caches, k, v, slot_mapping, layer_idx):
    """Scatter new K/V rows ([T, Hk, D]) into the stacked caches
    ([L, Hk, S, D]) at ``layer_idx``.

    Cache layout is head-major so a (head, block) read is one contiguous
    block_size x head_dim DMA in the Pallas kernels. Padding entries
    (slot == -1) are remapped to S (out of bounds) and dropped by scatter
    mode='drop' — the moral equivalent of the reference Triton kernel's
    slot==-1 early return (reference: nanovllm/layers/attention.py:23).
    Scattering into the full stacked buffer (rather than a scanned-out slice)
    lets XLA keep the donated cache in place across the layer loop instead of
    materializing a second copy.
    """
    num_slots = k_caches.shape[2]
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    # note: mixed basic/advanced indexing puts the slot axis first, so the
    # update value keeps the natural [T, Hk, D] layout
    k_caches = k_caches.at[layer_idx, :, slots, :].set(
        k.astype(k_caches.dtype), mode="drop")
    v_caches = v_caches.at[layer_idx, :, slots, :].set(
        v.astype(v_caches.dtype), mode="drop")
    return k_caches, v_caches


def _gqa_scores(q, k):
    """q [T, Hq, D] x k [Tk, Hk, D] -> scores [Hq, T, Tk] with GQA head grouping."""
    T, Hq, D = q.shape
    Hk = k.shape[1]
    G = Hq // Hk
    qg = q.reshape(T, Hk, G, D).astype(jnp.float32)
    s = jnp.einsum("thgd,shd->hgts", qg, k.astype(jnp.float32))
    return s.reshape(Hk * G, T, -1)


def _gqa_out(probs, v, Hq):
    """probs [Hq, T, Tk] x v [Tk, Hk, D] -> out [T, Hq, D]."""
    Hk = v.shape[1]
    G = Hq // Hk
    p = probs.reshape(Hk, G, probs.shape[1], probs.shape[2])
    o = jnp.einsum("hgts,shd->thgd", p, v.astype(jnp.float32))
    return o.reshape(o.shape[0], Hq, -1)


_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def prefill_attention_xla(q, k_cache, v_cache, meta: PrefillMeta, scale: float):
    """Masked-softmax reference implementation of ragged prefill attention.

    Reads K/V from the paged cache ([Hk, S, D]) via ``meta.k_slots`` so
    prefix-cache hits and fresh tokens are handled uniformly (the reference
    instead switches between two flash-attn call signatures,
    attention.py:64-70).
    """
    k = jnp.take(k_cache, meta.k_slots, axis=1).swapaxes(0, 1)  # [Tk, Hk, D]
    v = jnp.take(v_cache, meta.k_slots, axis=1).swapaxes(0, 1)
    s = _gqa_scores(q, k) * scale                   # [Hq, T, Tk]
    seg_ok = meta.q_segment_ids[:, None] == meta.k_segment_ids[None, :]
    causal = meta.k_positions[None, :] <= meta.positions[:, None]
    valid = (meta.q_segment_ids[:, None] >= 0) & (meta.k_segment_ids[None, :] >= 0)
    mask = seg_ok & causal & valid
    s = jnp.where(mask[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return _gqa_out(p, v, q.shape[1]).astype(q.dtype)


def prefill_attention(q, k_cache, v_cache, meta, scale, *, impl="xla", block_size=None):
    if impl == "pallas":
        from nanovllm_tpu.ops.pallas.flash_prefill import flash_prefill
        return flash_prefill(q, k_cache, v_cache, meta, scale)
    return prefill_attention_xla(q, k_cache, v_cache, meta, scale)


def decode_attention(q, k_cache, v_cache, meta, scale, *, impl="xla", block_size=256):
    if impl == "pallas":
        from nanovllm_tpu.ops.pallas.paged_decode import paged_decode
        return paged_decode(q, k_cache, v_cache, meta, scale, block_size=block_size)
    return _decode_attention_xla(q, k_cache, v_cache, meta, scale, block_size)


def _decode_attention_xla(q, k_cache, v_cache, meta: DecodeMeta, scale: float, block_size: int):
    """q [B, Hq, D] against the paged cache [Hk, S, D] via block tables."""
    B, W = meta.block_tables.shape
    offs = jnp.arange(block_size, dtype=jnp.int32)
    slots = (meta.block_tables[:, :, None] * block_size + offs[None, None, :]).reshape(-1)
    Hk = k_cache.shape[0]
    S = W * block_size
    k = jnp.take(k_cache, slots, axis=1).reshape(Hk, B, S, -1)
    v = jnp.take(v_cache, slots, axis=1).reshape(Hk, B, S, -1)
    Hq, D = q.shape[1], q.shape[2]
    G = Hq // Hk
    qg = q.reshape(B, Hk, G, D).astype(jnp.float32)
    s = jnp.einsum("bhgd,hbsd->bhgs", qg, k.astype(jnp.float32)) * scale
    pos = jnp.arange(S, dtype=jnp.int32)
    mask = pos[None, :] < meta.context_lens[:, None]
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgs,hbsd->bhgd", p, v.astype(jnp.float32))
    return o.reshape(B, Hq, D).astype(q.dtype)
