"""Fused quantized GEMM kernels (Pallas/MXU).

The reference's quantized matmuls are Triton CUDA kernels (reference:
nanovllm/utils/quantization.py:54-144 fused W8A8; 265-307 per-group
dequant-matmul). On TPU:

- **Per-group weight-only** (`group_dequant_matmul`): the XLA formulation
  must materialize the dequantized bf16 weight in HBM every call (K*N*2
  bytes of extra traffic — at g=128 that triples weight reads). This kernel
  dequantizes per [BK, BN] tile in VMEM inside the K-loop: HBM traffic is
  the int8/fp8 weight + scales only, so decode gets the full ~2x (int8)
  weight-bandwidth win.
- **Per-row / per-tensor W8A8** run through XLA dot_general with int32/fp32
  accumulation (ops/quantization.py:w8a8_matmul) — XLA already lowers those
  to the MXU with a fused epilogue; no kernel needed.

Grid (T/BT, N/BN, K/BK), K innermost; fp32 accumulator in VMEM scratch,
written out (cast) at the last K step. BK == group_size so each K tile reads
one scale row.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, gpb: int):
    """One K-step covers ``gpb`` quant groups (BK = gpb * group_size: the K
    block must keep a 128-lane-legal shape even for group_size < 128)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequant the weight tile in VMEM: [BK, BN] * this K-step's scale rows.
    # The caller lays the scales out as one 8-sublane-aligned row block per
    # K step (Mosaic rejects dynamic sublane starts it cannot prove are
    # multiples of 8); rows 0..gpb-1 of this step's block are the scales.
    s = s_ref[:gpb, :].astype(jnp.float32)  # [gpb, BN]
    BK, BN = w_ref.shape
    w = w_ref[:].astype(jnp.float32).reshape(gpb, BK // gpb, BN) * s[:, None, :]
    acc_ref[:] += jnp.dot(x_ref[:], w.reshape(BK, BN).astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_t", "block_n",
                                             "out_dtype", "interpret"))
def group_dequant_matmul(x, w_q, scale, *, group_size: int, block_t: int = 256,
                         block_n: int = 512, out_dtype=None, interpret: bool = False):
    """x [T, K] (bf16/f32) @ dequant(w_q [K, N], scale [K/g, N]) → [T, N].

    K must be a multiple of group_size (guaranteed by per_group_quant,
    ops/quantization.py); T and N are padded to block multiples here.
    """
    out_dtype = out_dtype or x.dtype
    T, K = x.shape
    _, N = w_q.shape
    assert K % group_size == 0, (K, group_size)
    BK = max(group_size, 128)          # lane-legal K block
    while K % BK:                      # group_size >= 128 always divides K;
        BK //= 2                       # for g < 128 fall back toward g
    gpb = BK // group_size
    assert gpb >= 1 and BK % group_size == 0, (BK, group_size)
    BT = min(block_t, _round_up(T, 8))
    BN = min(block_n, N)
    Tp = _round_up(T, BT)
    Np = _round_up(N, BN)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, ((0, 0), (0, Np - N)))
    n_k = K // BK
    # one 8-row sublane-aligned scale block per K step: row 8k+j holds the
    # scale of step k's group j (rows gpb..7 replicate the last group; the
    # kernel reads only the first gpb)
    assert gpb <= 8, (group_size, BK)
    row = jnp.arange(n_k * 8, dtype=jnp.int32)
    gather = (row // 8) * gpb + jnp.minimum(row % 8, gpb - 1)
    scale8 = jnp.take(scale, gather, axis=0)  # [n_k * 8, Np]

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, gpb=gpb),
        grid=(Tp // BT, Np // BN, n_k),
        in_specs=[
            pl.BlockSpec((BT, BK), lambda t, n, k: (t, k)),
            pl.BlockSpec((BK, BN), lambda t, n, k: (k, n)),
            pl.BlockSpec((8, BN), lambda t, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((Tp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, scale8)
    return out[:T, :N]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------- W8A8, fused act quant
def _w8a8_fused_kernel(x_ref, w_ref, sw_ref, o_ref, acc_ref, *, n_k: int):
    """W8A8 K-step with the dynamic activation quant fused into the prologue:
    the bf16 x tile is absmax-scaled and cast to int8 *in VMEM*, so the
    activation never round-trips HBM as int8 (the separate XLA quant pass
    costs read-2B + write-1B + read-1B per element; here it is one 2B read).

    The activation scale is per row *per K block* — finer than the per-row
    scale of the unfused path — so each K-step's int32 tile is folded into
    the fp32 accumulator with its own scale; the weight's per-column scale
    stays in the epilogue."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8)
    sx = absmax * (1.0 / 127.0)                      # [BT, 1]
    x_q = jnp.clip(jnp.round(x * (127.0 / absmax)), -127, 127).astype(jnp.int8)
    tile = jnp.dot(x_q, w_ref[:], preferred_element_type=jnp.int32)
    acc_ref[:] += tile.astype(jnp.float32) * sx

    @pl.when(k == n_k - 1)
    def _():
        sw = sw_ref[:].astype(jnp.float32)           # [1, BN]
        o_ref[:] = (acc_ref[:] * sw).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def w8a8_matmul_act_fused(x, w_q, sw, *, block_t: int = 256,
                          block_n: int = 8192, block_k: int = 512,
                          out_dtype=None, interpret: bool = False):
    """Fused dynamic-act-quant W8A8 GEMM: x [T, K] bf16/f32, w_q [K, N] int8,
    sw [N] f32 → [T, N]. Activation quant (per row per K block) happens in
    the kernel prologue (reference's fused Triton W8A8 north star,
    reference: nanovllm/utils/quantization.py:54-144).

    block_n defaults high so it clamps to N for serving shapes (N <= 8192):
    with one N block the x tile is read from HBM exactly once."""
    out_dtype = out_dtype or x.dtype
    T, K = x.shape
    _, N = w_q.shape
    BT = min(block_t, _round_up(T, 8))
    BN = min(block_n, N)
    BK = min(block_k, K)
    Tp, Np, Kp = _round_up(T, BT), _round_up(N, BN), _round_up(K, BK)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        sw = jnp.pad(sw, (0, Np - N))
    n_k = Kp // BK

    out = pl.pallas_call(
        functools.partial(_w8a8_fused_kernel, n_k=n_k),
        grid=(Tp // BT, Np // BN, n_k),
        in_specs=[
            pl.BlockSpec((BT, BK), lambda t, n, k: (t, k)),
            pl.BlockSpec((BK, BN), lambda t, n, k: (k, n)),
            pl.BlockSpec((1, BN), lambda t, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((Tp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, sw[None, :])
    return out[:T, :N]


# ------------------------------------------------------------------- W8A8
def _w8a8_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, *, n_k: int):
    """int8 x int8 -> int32 MXU tiles accumulated in VMEM; the per-row x
    per-column scale product is applied in the epilogue before writeback —
    the int32 accumulator never touches HBM (the XLA formulation's extra
    [T, N] int32 round trip is what keeps it at ~45% of peak)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        # scales ride as [1, BT] / [1, BN] lane vectors (1D operands trip
        # XLA/Mosaic layout disagreements); the row scale is transposed to
        # sublanes once per tile in the epilogue
        sx = jnp.swapaxes(sx_ref[:].astype(jnp.float32), 0, 1)  # [BT, 1]
        sw = sw_ref[:].astype(jnp.float32)                      # [1, BN]
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sx * sw).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def w8a8_matmul_pallas(x_q, sx, w_q, sw, *, block_t: int = 256,
                       block_n: int = 512, block_k: int = 512,
                       out_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused W8A8 GEMM: x_q [T, K] int8, sx [T] f32, w_q [K, N] int8,
    sw [N] f32 → [T, N] out_dtype. The TPU-native analogue of the
    reference's fused Triton kernel (reference: quantization.py:54-144)."""
    T, K = x_q.shape
    _, N = w_q.shape
    BT = min(block_t, _round_up(T, 32))  # int8 sublane packing: 32 rows
    BN = min(block_n, N)
    BK = min(block_k, K)
    Tp, Np, Kp = _round_up(T, BT), _round_up(N, BN), _round_up(K, BK)
    if Tp != T:
        x_q = jnp.pad(x_q, ((0, Tp - T), (0, 0)))
        sx = jnp.pad(sx, (0, Tp - T))
    if Kp != K:
        x_q = jnp.pad(x_q, ((0, 0), (0, Kp - K)))
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        sw = jnp.pad(sw, (0, Np - N))
    n_k = Kp // BK

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        grid=(Tp // BT, Np // BN, n_k),
        in_specs=[
            pl.BlockSpec((BT, BK), lambda t, n, k: (t, k)),
            pl.BlockSpec((BK, BN), lambda t, n, k: (k, n)),
            pl.BlockSpec((1, BT), lambda t, n, k: (0, t)),
            pl.BlockSpec((1, BN), lambda t, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((Tp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x_q, w_q, sx[None, :], sw[None, :])
    return out[:T, :N]
