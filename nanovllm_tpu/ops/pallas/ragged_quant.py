"""Quantized ragged paged attention — the in-house kernel for sub-byte and
row-scaled KV pools, prefill AND decode (mixed batches included).

Replaces both reference flash-attn entry points for quantized pools
(reference: nanovllm/layers/attention.py:67-74) and completes SURVEY §2.9's
"the build writes the kernel itself" mapping: the library ragged kernel
(jax.experimental.pallas.ops.tpu.ragged_paged_attention) cannot read
nibble-packed pages or per-(row, head) scale sidecars, which previously
forced the rs modes through a bf16 scratch-dequant prefill detour (+24%
measured) and a separate decode-only kernel.

Loop architecture derived from the in-tree JAX kernel (Apache-2.0,
jax/experimental/pallas/ops/tpu/ragged_paged_attention/kernel.py) — the
grid/seq/kv-block walk, double-buffered multi-page DMA, and masked
online-softmax accumulation follow its design, which round-3 measurements
put at ~88% of HBM peak (speed-of-light for dense int8 pages). What's new,
and why it goes *below* that floor on int4 pools:

- **Nibble-packed int4 pages** [P, ps, Hk, D] (byte b = 16*V + K): half the
  data bytes of int8 pages. K/V head planes are extracted with the
  uint32-bitcast strided-row trick (one strided load shared by 4 byte
  planes) plus two integer VPU ops per plane — no strided sub-tile loads
  (the hidden relayout cost measured in flash_decode v5).
- **int8 x int8 MXU matmuls**: q rows are row-quantized to int8 ONCE per
  grid step into a head-major scratch (scale folded into the score
  dequant); dense-mode p rows likewise for the PV contraction. Both
  matmuls then ride the v5e's 394-TOPS int8 pipe at 2x the bf16 tile rate
  (rs modes keep bf16 PV: per-row V scales fold into p, whose dynamic
  range would crush an int8 row quant — measured 6% output error).
- **Per-(row, head) scale sidecar** [P, ps, 128] int8, LOG-encoded
  (scale = 2^(e/8), ops.attention.encode_kv_scales), DMA'd alongside the
  data pages. TPU HBM pads every array's minor dim to 128 lanes, so a row
  costs 128 lanes regardless — int8 makes that 128 B where round-4's f32
  sidecar paid 512 B (33% of int4 decode traffic). Scales apply
  *compactly*: one [Tkv, 2Hk] -> [2Hk, Tkv] transpose + exp2 per kv-block,
  then per-head [1, Tkv] row slices multiply the scores (K) and the
  probabilities (V). This sidesteps the all-pairs layout's per-column
  "lane-stretch", which Mosaic cannot do efficiently (reshape: unsupported
  shape cast; roll: 49 us; gather: unsupported — tools/stretch_probe.py).
- **Head-major row order**: q/acc live as [Hq, bq, D] scratch so per-head
  slices collapse leading dims only; the causal/store masks are shared
  across the head loop (row token = row % bq). One [bq, Hq] <-> [Hq, bq]
  transpose per grid step replaces 8 sub-tile head slices per kv block.

Modes (all pools interleave combined heads — K even, V odd — so every pool
shards identically on the head axis under TP):
  int4_rs — [P, ps, Hk, D] packed nibbles + int8 log-scale sidecar
  int8_rs — [P, ps, 2Hk, D] int8 + int8 log-scale sidecar
  int8    — [P, ps, 2Hk, D] int8, global k/v scale; dense decode/prefill
            on the int8-MXU path
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.attention import KV_SCALE_STEP

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class _PageCopies:
    """Async copies of one kv block's data pages (and scale pages)."""

    def __init__(self, pages_hbm, scales_hbm, kv_buf, sc_buf, sem,
                 page_indices_ref, seq_id, start_page, end_page):
        # Copies past the sequence's last page are SKIPPED, not clamped:
        # round 5 measured the old clamp-to-page-0 behavior re-copying page
        # 0 once per out-of-range slot — at bkv=16 with ~9-page contexts
        # that nearly doubled decode DMA traffic (the whole int4-vs-int8
        # end-to-end gap of the first r5 bench). start() and wait() gate on
        # the same predicate, so semaphore counts stay balanced.
        self._copies = []
        for i in range(kv_buf.shape[0]):
            page_idx = start_page + i
            valid = page_idx < end_page
            pid = page_indices_ref[seq_id, lax.select(valid, page_idx, 0)]
            self._copies.append(
                (valid,
                 pltpu.make_async_copy(pages_hbm.at[pid], kv_buf.at[i], sem)))
            if scales_hbm is not None:
                # NOTE: priority=1 (background queue) was tried for these
                # small sidecar copies and measured-REJECTED: they starve
                # behind the busy data-copy queue and stall every block's
                # wait (int8_rs decode 0.88x -> 1.5-4x library)
                self._copies.append(
                    (valid,
                     pltpu.make_async_copy(scales_hbm.at[pid], sc_buf.at[i],
                                           sem)))

    def start(self):
        for valid, c in self._copies:
            @pl.when(valid)
            def _():
                c.start()

    def wait(self):
        for valid, c in self._copies:
            @pl.when(valid)
            def _():
                c.wait()


def _plane_loader(kv_ref, *, mode, num_kv_heads, interpret):
    """Returns get(h) -> (k_h, v_h) int8 [Tkv, head_dim] head planes from
    the flattened combined-row view [Tkv * hdim, head_dim].

    Extraction uses uint32-bitcast strided row loads (4 int8 sublanes pack
    per word), each shared by the 4 byte planes it contains — no sub-tile
    strided slice is ever issued. Interpret mode (CPU tests) falls back to
    plain strided ref loads (refs don't support bitcast there)."""
    Hk = num_kv_heads
    cache = {}

    def packed(row):
        """uint32 strided load covering combined rows 4*(row//4)..+3."""
        j = row // 4
        if j not in cache:
            step = (Hk if mode == "int4_rs" else 2 * Hk) // 4
            cache[j] = kv_ref.bitcast(jnp.uint32)[j::step, :]
        return cache[j]

    def byte_plane(row):
        b = packed(row) >> jnp.uint32(8 * (row % 4))
        return pltpu.bitcast(b.astype(jnp.uint8), jnp.int8)

    def get(h):
        """int4 planes return BIASED nibbles (k+8, v+8 in [1, 15]); the
        callers fold the -8 into downstream f32/bf16 math (packed int8
        subtract does not legalize in Mosaic). int8 planes are unbiased."""
        if mode == "bf16":
            if interpret:
                return kv_ref[2 * h::2 * Hk, :], kv_ref[2 * h + 1::2 * Hk, :]
            # 2 bf16 rows per uint32 word: K_h (combined row 2h) is the low
            # half, V_h (2h+1) the high half of word plane h — one strided
            # load serves the whole head pair
            if h not in cache:
                cache[h] = kv_ref.bitcast(jnp.uint32)[h::Hk, :]
            w = cache[h]
            k = pltpu.bitcast(w.astype(jnp.uint16), jnp.bfloat16)
            v = pltpu.bitcast((w >> jnp.uint32(16)).astype(jnp.uint16),
                              jnp.bfloat16)
            return k, v
        if mode == "fp8":
            k_row, v_row = 2 * h, 2 * h + 1
            if interpret:
                return (kv_ref[k_row::2 * Hk, :].astype(jnp.bfloat16),
                        kv_ref[v_row::2 * Hk, :].astype(jnp.bfloat16))
            def f8(row):
                b = packed(row) >> jnp.uint32(8 * (row % 4))
                return pltpu.bitcast(b.astype(jnp.uint8),
                                     jnp.float8_e4m3fn).astype(jnp.bfloat16)
            return f8(k_row), f8(v_row)
        if mode == "int4_rs":
            if interpret:
                plane = kv_ref[h::Hk, :].astype(jnp.int32)
                v32 = (plane + 8) >> 4             # V nibble
                k32 = plane - (v32 << 4)           # K nibble
                return ((k32 + 8).astype(jnp.int8),
                        (v32 + 8).astype(jnp.int8))
            # SWAR nibble split in the PACKED domain: per byte
            # t = (b ^ 0x80) + 8 = 16*(v+8) + (k+8) with no cross-byte
            # carries (t <= 255), so both nibbles come out of 5 packed-
            # width ops — the round-4 path unpacked to int32 first, which
            # cost ~4x the vector registers per element
            b = byte_plane(h)                      # int8 [Tkv, D] packed
            w = pltpu.bitcast(b, jnp.uint32)       # [Tkv/4, D] (free)
            t = (w ^ jnp.uint32(0x80808080)) + jnp.uint32(0x08080808)
            k8 = pltpu.bitcast(t & jnp.uint32(0x0F0F0F0F), jnp.int8)
            v8 = pltpu.bitcast((t >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F),
                               jnp.int8)
            return k8, v8
        # int8 rows: hdim = 2Hk, interleaved: K_h at 2h, V_h at 2h + 1
        # (int8_rs and dense share the layout since round 5)
        k_row, v_row = 2 * h, 2 * h + 1
        if interpret:
            return kv_ref[k_row::2 * Hk, :], kv_ref[v_row::2 * Hk, :]
        return byte_plane(k_row), byte_plane(v_row)

    return get


def _kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[max_num_seqs]
    page_indices_ref,  # i32[max_num_seqs, pages_per_seq]
    cu_q_lens_ref,     # i32[max_num_seqs + 1]
    seq_buf_idx_ref,   # i32[2]
    num_seqs_ref,      # i32[1]
    # inputs
    q_ref,             # [bq, Hq, D] this q block
    pages_hbm,         # data page pool (ANY)
    scales_hbm,        # [P, ps, SW] f32 scale pool (ANY), or None
    # output
    o_ref,             # [bq, Hq, D]
    # scratch
    kv_bufs,           # [2, bkv, ps, hdim, D] int8
    sc_bufs,           # [2, bkv, ps, SW] int8 log-scales, or None
    sems,              # DMA [2]
    l_ref,             # f32[Hk, G * bq, 128]   rows in (g, token) order
    m_ref,             # f32[Hk, G * bq, 128]
    acc_ref,           # f32[Hq, bq, D]         head-major
    qi8_ref,           # i8[Hq, bq, D]          row-quantized q, head-major
    qsc_ref,           # f32[Hq, bq, 128]       q row dequant scales
    *,
    sm_scale: float,
    mode: str,
    kv_scale: float | None,
    num_kv_heads: int,
    mask_value: float = _MASK_VALUE,
    interpret: bool = False,
    debug: str = "full",
    pv_int8: bool = False,
):
    bq, Hq, D = q_ref.shape
    Hk = num_kv_heads
    G = Hq // Hk
    M = G * bq
    pages_per_seq = page_indices_ref.shape[-1]
    num_seqs = num_seqs_ref[0]
    _, bkv, page_size, hdim, _ = kv_bufs.shape
    kv_per_blk = bkv * page_size
    with_scales = mode in ("int8_rs", "int4_rs")
    q_blk_idx = pl.program_id(0)
    init_seq_idx = seq_buf_idx_ref[0]
    init_buf_idx = seq_buf_idx_ref[1]
    q_len_start = q_blk_idx * bq
    q_len_end = q_len_start + bq

    def make_copies(seq_idx, kv_blk_idx, buf_idx):
        start = kv_blk_idx * bkv
        end = jnp.minimum(pages_per_seq,
                          pl.cdiv(kv_lens_ref[seq_idx], page_size))
        return _PageCopies(
            pages_hbm,
            None if debug in ("dma_data", "fullnosc") else scales_hbm,
            kv_bufs.at[buf_idx],
            None if sc_bufs is None else sc_bufs.at[buf_idx],
            sems.at[buf_idx], page_indices_ref, seq_idx, start, end)

    if debug != "compute":
        @pl.when(q_blk_idx == 0)
        def _prefetch_first():
            make_copies(init_seq_idx, 0, init_buf_idx).start()

    float_mode = mode in ("bf16", "fp8")
    # ---- once per grid step: head-major (row-quantized) q ----------------
    qt = lax.transpose(q_ref[...], (1, 0, 2)).astype(jnp.float32)  # [Hq,bq,D]
    qt = qt * (sm_scale if kv_scale is None else sm_scale * kv_scale)
    if float_mode:
        # bf16 pipeline: q stays bf16 (sm_scale and the fp8 k-side global
        # scale folded in); no dynamic row quantization
        qi8_ref[...] = qt.astype(jnp.bfloat16)
    else:
        qmax = jnp.maximum(jnp.max(jnp.abs(qt), axis=2, keepdims=True), 1e-8)
        qi8_ref[...] = jnp.round(qt * (127.0 / qmax)).astype(jnp.int8)
        qsc_ref[...] = jnp.broadcast_to(qmax * (1.0 / 127.0), qsc_ref.shape)
    # constant mask geometry, shared by every (seq, kv-block, head):
    # row r of a per-head [M, Tkv] tile is token (r % bq)
    tok_minus_col = (lax.broadcasted_iota(jnp.int32, (M, kv_per_blk), 0) % bq
                     - lax.broadcasted_iota(jnp.int32, (M, kv_per_blk), 1))

    def is_cur_q_blk_needed(state):
        done, cur_seq, _ = state
        return jnp.logical_and(
            done == 0,
            jnp.logical_and(q_len_start < cu_q_lens_ref[num_seqs],
                            cur_seq < num_seqs))

    def compute_q_blk(state):
        done, cur_seq, cur_buf = state
        q_start = cu_q_lens_ref[cur_seq]
        q_end = cu_q_lens_ref[cur_seq + 1]
        q_len = q_end - q_start
        kv_len = kv_lens_ref[cur_seq]
        store_start = jnp.maximum(q_start - q_len_start, 0)
        store_end = jnp.minimum(q_end - q_len_start, bq)

        def next_ids(kv_blk_idx, cur_buf):
            next_kv = kv_blk_idx + 1
            last_kv = next_kv * kv_per_blk >= kv_len
            next_kv = lax.select(last_kv, 0, next_kv)
            seq_done = q_end <= q_len_end
            next_seq = lax.select(last_kv,
                                  lax.select(seq_done, cur_seq + 1, cur_seq),
                                  cur_seq)
            # single q-block grid with all heads resident: past the last
            # seq there is nothing left to prefetch
            valid = next_seq < num_seqs
            next_seq = lax.select(valid, next_seq, 0)
            return valid, next_seq, next_kv, lax.select(cur_buf == 0, 1, 0)

        def masked_store_rows(ref, val):
            """Store only this sequence's token rows (token = row % bq)."""
            tok = lax.broadcasted_iota(jnp.int32, ref.shape, 0) % bq
            pltpu.store(ref, val, mask=jnp.logical_and(
                tok >= store_start, tok < store_end))

        def masked_store_acc(ref, val):
            tok = lax.broadcasted_iota(jnp.int32, ref.shape, 1)
            pltpu.store(ref, val, mask=jnp.logical_and(
                tok >= store_start, tok < store_end))

        def head_attention(h, k, v, sck, scv, mask_cond, vcol_valid,
                           kv_blk_idx):
            """One head's masked online-softmax block update (library-style
            renormalize-every-block accumulation, masked to this sequence's
            token rows). k/v [Tkv, D] int8; sck/scv [1, Tkv] or None."""
            head_l = l_ref.at[h]
            head_m = m_ref.at[h]
            head_acc = acc_ref.at[pl.ds(h * G, G)]          # [G, bq, D]

            def load_with_init(ref, init_val):
                return jnp.where(kv_blk_idx == 0,
                                 jnp.full_like(ref, init_val), ref[...])

            q_rows = qi8_ref[pl.ds(h * G, G)].reshape(M, D)  # (g, token) rows
            if debug == "noextract":
                k = jnp.zeros((kv_per_blk, D), k.dtype)
                v = jnp.zeros((kv_per_blk, D), v.dtype)
            if float_mode:
                # bf16 x bf16 MXU with f32 accumulation; scales are global
                # and already folded into q
                s = lax.dot_general(q_rows, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            else:
                qsc = qsc_ref[pl.ds(h * G, G)].reshape(M, 128)[:, :1]
                s = lax.dot_general(q_rows, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                s = s.astype(jnp.float32)
                if mode == "int4_rs":
                    # k is biased (k+8): q.k = q.(k+8) - 8*rowsum(q)
                    qsum = jnp.sum(q_rows.astype(jnp.float32), axis=1,
                                   keepdims=True)
                    s = s - 8.0 * qsum
                s = s * qsc
            if sck is not None:
                s = s * sck
            # REPLACE (not add) masked scores: skipped out-of-range page
            # copies leave stale VMEM, which for float pools can be NaN —
            # an additive mask would propagate it
            s = jnp.where(mask_cond, mask_value, s)
            if debug == "nosoftmax":
                pv = lax.dot_general(
                    s.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                masked_store_acc(head_acc, pv.reshape(head_acc.shape))
                return
            m_curr = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m_curr)
            # softmax denominator uses the raw exp weights; V row scales
            # affect only the numerator (they dequantize V)
            l_sum = p.sum(axis=1, keepdims=True)
            if float_mode:
                # zero V rows past kv_len: they were never DMA'd (skipped
                # copies) and stale bf16 NaN would poison the contraction
                # even against p == 0
                v = jnp.where(vcol_valid, v, jnp.zeros_like(v))
                pv = lax.dot_general(p.astype(jnp.bfloat16), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                if kv_scale is not None:
                    # fp8 global scale, V side (K side rode in with q)
                    pv = pv * kv_scale
            elif scv is None:
                # dense: int8 MXU PV. p rows are plain softmax weights with
                # max exactly 1, so per-row absmax quant loses < 1/254 of
                # the weight mass
                pmax = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-30)
                p_i8 = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
                pv = lax.dot_general(p_i8, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                pv = pv.astype(jnp.float32) * (pmax * (1.0 / 127.0))
                if kv_scale is not None:
                    pv = pv * kv_scale
            elif pv_int8:
                # MEASURED-REJECTED experiment (kept for the record): int8
                # PV for rs pools ran 2.7x SLOWER than bf16 PV (2.80 vs
                # 1.04 ms at B=256/ctx=1k) — the per-head rowmax+round+cast
                # passes cost more than the halved MXU tiles save — and
                # adds quant noise proportional to the in-block V-scale
                # spread. tools/ragged_quant_validate.py pv8.
                if mode == "int4_rs":
                    v = (v.astype(jnp.int32) - 8).astype(jnp.int8)
                p_s = p * scv
                pmax = jnp.maximum(jnp.max(p_s, axis=1, keepdims=True),
                                   1e-30)
                p_i8 = jnp.round(p_s * (127.0 / pmax)).astype(jnp.int8)
                pv = lax.dot_general(p_i8, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                pv = pv.astype(jnp.float32) * (pmax * (1.0 / 127.0))
            else:
                # rs: V row scales fold into p, whose dynamic range then
                # spans the scale outliers — int8 row quant would crush the
                # non-outlier tokens' weights (measured 6% output error on
                # e^±2-spread rows). bf16 p keeps a per-element mantissa;
                # the PV matmul runs at the bf16 tile rate, still under the
                # int4 HBM floor (scores stay int8).
                p_s = p * scv
                v_mm = v.astype(jnp.bfloat16)
                if mode == "int4_rs":
                    v_mm = v_mm - jnp.bfloat16(8.0)  # v is biased (v+8)
                pv = lax.dot_general(
                    p_s.astype(jnp.bfloat16), v_mm,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            lm_shape = head_m.shape
            m_curr_b = jnp.broadcast_to(m_curr, lm_shape)
            l_curr = jnp.broadcast_to(l_sum, lm_shape)
            m_prev = load_with_init(head_m, -jnp.inf)
            l_prev = load_with_init(head_l, 0.0)
            m_next = jnp.maximum(m_prev, m_curr_b)
            masked_store_rows(head_m, m_next)
            alpha = jnp.exp(m_prev - m_next)
            beta = jnp.exp(m_curr_b - m_next)
            l_alpha = alpha * l_prev
            l_next = l_alpha + beta * l_curr
            l_next_safe = jnp.where(l_next == 0.0, 1.0, l_next)
            masked_store_rows(head_l, l_next_safe)

            def bcast(arr, shape):
                if arr.shape == shape:
                    return arr
                return jnp.concatenate(
                    [arr for _ in range(shape[1] // arr.shape[1])], axis=1)

            o_curr = load_with_init(head_acc, 0.0).reshape(M, D)
            out = lax.div(bcast(l_alpha, pv.shape) * o_curr
                          + bcast(beta, pv.shape) * pv,
                          bcast(l_next_safe, pv.shape))
            masked_store_acc(head_acc, out.reshape(head_acc.shape))

        def kv_blk_valid(state):
            kv_blk_idx, _ = state
            return kv_blk_idx * kv_per_blk < kv_len

        def compute_kv_blk(state):
            kv_blk_idx, cur_buf = state
            valid, nseq, nkv, nbuf = next_ids(kv_blk_idx, cur_buf)

            if debug != "compute":
                @pl.when(valid)
                def _prefetch_next():
                    make_copies(nseq, nkv, nbuf).start()

                make_copies(cur_seq, kv_blk_idx, cur_buf).wait()
            if debug == "dma_data":
                acc_ref[0] += kv_bufs[cur_buf, 0, :bq, 0, :].astype(
                    jnp.float32)
                return kv_blk_idx + 1, nbuf
            if debug == "dma":
                # attribution mode: touch the buffers so copies stay live,
                # skip the per-head compute
                acc_ref[0] += kv_bufs[cur_buf, 0, :bq, 0, :].astype(
                    jnp.float32)
                if sc_bufs is not None:
                    acc_ref[0, :, :1] += sc_bufs[cur_buf, 0, :bq, :1].astype(
                        jnp.float32)
                return kv_blk_idx + 1, nbuf
            kv_ref = kv_bufs.at[cur_buf].reshape(
                bkv * page_size * hdim, D)
            planes = _plane_loader(kv_ref, mode=mode, num_kv_heads=Hk,
                                   interpret=interpret)
            # causal + past-kv-len mask, shared across heads: token row t
            # attends col c iff (kv_len - q_len + t') >= c' in sequence
            # coordinates — rearranged onto the constant tok-col iota
            thresh = kv_blk_idx * kv_per_blk - (kv_len - q_len) \
                - q_len_start + q_start
            mask_cond = tok_minus_col < thresh
            vcol_valid = (lax.broadcasted_iota(jnp.int32, (kv_per_blk, 1), 0)
                          < kv_len - kv_blk_idx * kv_per_blk)
            if with_scales:
                e = sc_bufs[cur_buf].reshape(
                    kv_per_blk, -1)[:, :2 * Hk]          # [Tkv, 2Hk] int8
                if debug == "noexp2":
                    sc_t = lax.transpose(e.astype(jnp.float32), (1, 0))
                elif debug == "noscale":
                    sc_t = jnp.full((2 * Hk, kv_per_blk), 1.0, jnp.float32)
                else:
                    sc_t = lax.transpose(e.astype(jnp.float32), (1, 0))
                    sc_t = jnp.exp2(sc_t * KV_SCALE_STEP)  # [2Hk, Tkv]
                # zero scales past kv_len unconditionally: those rows were
                # never DMA'd this block; stale VMEM bits decode to finite
                # (but arbitrary) scales that would leak through the
                # causally-masked scores' exp() renormalization
                cols = lax.broadcasted_iota(jnp.int32, sc_t.shape, 1)
                sc_t = jnp.where(
                    cols < kv_len - kv_blk_idx * kv_per_blk, sc_t, 0.0)
            for h in range(Hk):
                k_h, v_h = planes(h)
                head_attention(
                    h, k_h, v_h,
                    sc_t[2 * h:2 * h + 1, :] if with_scales else None,
                    sc_t[2 * h + 1:2 * h + 2, :] if with_scales else None,
                    mask_cond, vcol_valid, kv_blk_idx)
            return kv_blk_idx + 1, nbuf

        _, next_buf = lax.while_loop(kv_blk_valid, compute_kv_blk,
                                     (0, cur_buf))
        next_seq = lax.select(q_end <= q_len_end, cur_seq + 1, cur_seq)
        done = lax.select(q_end < q_len_end, done, 1)
        return done, next_seq, next_buf

    _, seq_idx, buf_idx = lax.while_loop(
        is_cur_q_blk_needed, compute_q_blk,
        (0, init_seq_idx, init_buf_idx))
    seq_buf_idx_ref[0] = lax.select(seq_idx < num_seqs, seq_idx, 0)
    seq_buf_idx_ref[1] = buf_idx
    o_ref[...] = lax.transpose(acc_ref[...], (1, 0, 2)).astype(q_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "kv_mode", "kv_scale", "num_kv_pages_per_block",
    "num_queries_per_block", "vmem_limit_bytes", "interpret", "debug",
    "pv_int8"))
def ragged_quant_attention(
    q,                 # [T, Hq, D]
    kv_pages,          # see module docstring per mode
    kv_lens,           # i32[max_num_seqs]
    page_indices,      # i32[max_num_seqs, pages_per_seq]
    cu_q_lens,         # i32[max_num_seqs + 1]
    num_seqs,          # i32[1]
    kv_scales=None,    # [P, ps, SW] f32 (rs modes)
    *,
    sm_scale: float = 1.0,
    kv_mode: str = "int4_rs",
    kv_scale: float | None = None,
    num_kv_pages_per_block: int = 16,
    num_queries_per_block: int = 8,
    vmem_limit_bytes: int = 100 * 2**20,
    interpret: bool = False,
    debug: str = "full",
    pv_int8: bool = False,
):
    """Ragged paged attention over quantized pools (prefill, decode, mixed).

    ``debug``: "full" | "dma" (copies only, trivial compute) | "dma_data"
    (data copies only — isolates the scale sidecar's DMA cost) | "compute"
    (no copies) — the attribution modes tools/ragged_quant_validate.py's
    split stage uses to bound the DMA and compute sides separately.

    Same calling convention as the library ragged kernel plus the scale
    sidecar. Every sequence with index < num_seqs must have kv_len >= 1.
    Returns [T, Hq, D] in q's dtype."""
    T, Hq, D = q.shape
    P, page_size, hdim, Dp = kv_pages.shape
    assert Dp == D, (Dp, D)
    assert kv_mode in ("int4_rs", "int8_rs", "int8", "bf16", "fp8"), kv_mode
    page_dtype = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn}.get(
        kv_mode, jnp.int8)
    assert kv_pages.dtype == page_dtype, (kv_pages.dtype, kv_mode)
    Hk = hdim if kv_mode == "int4_rs" else hdim // 2
    G = Hq // Hk
    assert Hq % Hk == 0
    rs = kv_mode in ("int4_rs", "int8_rs")
    if rs:
        assert kv_scales is not None and kv_scale is None
        SW = kv_scales.shape[-1]
        assert kv_scales.shape == (P, page_size, SW), kv_scales.shape
        assert kv_scales.dtype == jnp.int8, kv_scales.dtype  # log-encoded
    else:
        assert kv_scales is None
    if not interpret:
        # the bitcast head-plane extraction packs 4 byte rows (2 bf16 rows)
        # per uint32
        assert hdim % (2 if kv_mode == "bf16" else 4) == 0, (kv_mode, hdim)

    bq = min(num_queries_per_block, T)
    bkv = min(num_kv_pages_per_block, page_indices.shape[1])
    num_q_blks = pl.cdiv(T, bq)

    float_mode = kv_mode in ("bf16", "fp8")
    q_spec = pl.BlockSpec((bq, Hq, D), lambda i, *_: (i, 0, 0))
    in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((2, bkv, page_size, hdim, D), page_dtype),
        None,
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((Hk, G * bq, 128), jnp.float32),   # l
        pltpu.VMEM((Hk, G * bq, 128), jnp.float32),   # m
        pltpu.VMEM((Hq, bq, D), jnp.float32),         # acc (head-major)
        # q, head-major: row-quantized int8 + scales, or plain bf16
        pltpu.VMEM((Hq, bq, D), jnp.bfloat16 if float_mode else jnp.int8),
        pltpu.VMEM((Hq, bq, 128), jnp.float32),       # q row scales (int)
    ]
    operands = [kv_lens, page_indices, cu_q_lens,
                jnp.array((0, 0), jnp.int32), num_seqs, q, kv_pages]
    if rs:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch[1] = pltpu.VMEM((2, bkv, page_size, SW), jnp.int8)
        operands.append(kv_scales)
        body = functools.partial(
            _kernel, sm_scale=sm_scale, mode=kv_mode, kv_scale=None,
            num_kv_heads=Hk, interpret=interpret, debug=debug,
            pv_int8=pv_int8)
    else:
        scratch = [s for i, s in enumerate(scratch) if i != 1]
        body = functools.partial(
            _kernel_dense_entry, sm_scale=sm_scale, mode=kv_mode,
            kv_scale=kv_scale, num_kv_heads=Hk, interpret=interpret,
            debug=debug)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_q_blks,),
        in_specs=in_specs,
        out_specs=q_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
        name="ragged_quant_attention",
    )(*operands)


def _kernel_dense_entry(kv_lens_ref, page_indices_ref, cu_q_lens_ref,
                        seq_buf_idx_ref, num_seqs_ref, q_ref, pages_hbm,
                        o_ref, kv_bufs, sems, l_ref, m_ref, acc_ref,
                        qi8_ref, qsc_ref, **kw):
    """Signature adapter: dense pools carry no scale operands/scratch."""
    _kernel(kv_lens_ref, page_indices_ref, cu_q_lens_ref, seq_buf_idx_ref,
            num_seqs_ref, q_ref, pages_hbm, None, o_ref, kv_bufs, None,
            sems, l_ref, m_ref, acc_ref, qi8_ref, qsc_ref, **kw)
