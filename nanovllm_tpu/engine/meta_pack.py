"""Packed metadata transport: one i32 + one f32 upload per device call.

The per-call attention metadata (AttnMeta / DecodeMeta) is ~16 small arrays.
Uploading them individually costs one host->device transfer each — over a
remote PJRT transport that is ~3-4 ms *per transfer*, which measured as ~54 ms
of a 100 ms prefill call (the reference has the same structure but pays PCIe
latencies, model_runner.py:182-270). Here the host packs every integer field
into ONE i32 vector and every float field into ONE f32 vector; the jitted step
slices them back apart on device (static offsets, so XLA fuses the slices into
the consumers — the unpack is free).

The split functions are shape-generic: handed a writable numpy buffer they
return views (the host fills them in place); handed a traced jnp array they
return slices (the device unpack). One source of truth for the layout.

The trailing i32 element carries the engine's step counter so the per-call
PRNG key can be derived on device (``fold_in(base_key, ctr)``) instead of
uploading a freshly folded key every call.
"""

from typing import NamedTuple

import numpy as np


class PackLayout(NamedTuple):
    """Static sizes of the fixed sections. B = max sequence lanes,
    W = page-table width, NP/NS = store-table capacities."""

    B: int
    W: int
    NP: int
    NS: int


def _prefill_fixed(layout: PackLayout) -> int:
    B, W, NP, NS = layout
    # kv_lens, cu(B+1), num_seqs, last_idx, slot_ids, top_ks,
    # input_src_slot, pages, store, ctr
    return 6 * B + 4 + B * W + 2 * NP + 3 * NS + 1


def prefill_i32_size(T: int, layout: PackLayout) -> int:
    return 3 * T + _prefill_fixed(layout)


def split_prefill_i32(buf, layout: PackLayout):
    """-> (dict of named sections, T). Works on numpy (views) and jnp."""
    B, W, NP, NS = layout
    total = buf.shape[0]
    T = (total - _prefill_fixed(layout)) // 3
    o = 0

    def take(n):
        nonlocal o
        s = buf[o:o + n]
        o += n
        return s

    v = dict(
        input_ids=take(T),
        positions=take(T),
        q_segment_ids=take(T),
        kv_lens=take(B),
        page_indices=take(B * W).reshape(B, W),
        cu_q_lens=take(B + 1),
        num_seqs=take(1),
        last_token_idx=take(B),
        slot_ids=take(B),
        top_ks=take(B),
        input_src_slot=take(B),
        store_page_src=take(NP),
        store_page_dst=take(NP),
        store_row_src=take(NS),
        store_row_dst_page=take(NS),
        store_row_dst_pos=take(NS),
        store_counts=take(2),
        step_ctr=take(1),
    )
    assert o == total, (o, total)
    return v, T


def split_decode_i32(buf, layout: PackLayout):
    """-> dict of named sections. B (the padded decode batch bucket) is
    derived from the buffer length; W is static."""
    W = layout.W
    total = buf.shape[0]
    B = (total - 2) // (W + 4)
    o = 0

    def take(n):
        nonlocal o
        s = buf[o:o + n]
        o += n
        return s

    v = dict(
        slot_ids=take(B),
        kv_lens=take(B),
        page_indices=take(B * W).reshape(B, W),
        steps_left=take(B),
        num_seqs=take(1),
        top_ks=take(B),
        step_ctr=take(1),
    )
    assert o == total, (o, total)
    return v


def decode_i32_size(B: int, layout: PackLayout) -> int:
    return B * (layout.W + 4) + 2


def split_f32(fbuf):
    """temperatures / top_ps, each of the section's lane count."""
    B = fbuf.shape[0] // 2
    return dict(temperatures=fbuf[:B], top_ps=fbuf[B:2 * B])


def new_prefill_bufs(T: int, layout: PackLayout):
    buf = np.zeros(prefill_i32_size(T, layout), np.int32)
    fbuf = np.zeros(2 * layout.B, np.float32)
    v, _ = split_prefill_i32(buf, layout)
    fv = split_f32(fbuf)
    # non-zero defaults
    v["q_segment_ids"][:] = -1
    v["slot_ids"][:] = layout.B
    v["input_src_slot"][:] = -1    # -1 = host-provided input token
    fv["top_ps"][:] = 1.0
    return buf, fbuf, v, fv


def new_decode_bufs(B: int, layout: PackLayout):
    buf = np.zeros(decode_i32_size(B, layout), np.int32)
    fbuf = np.zeros(2 * B, np.float32)
    v = split_decode_i32(buf, layout)
    fv = split_f32(fbuf)
    v["slot_ids"][:] = layout.B
    fv["top_ps"][:] = 1.0
    return buf, fbuf, v, fv
