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


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequant the weight tile in VMEM: [BK, BN] * scale row [BK/g=1, BN]
    w = w_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)
    acc_ref[:] += jnp.dot(x_ref[:], w.astype(x_ref.dtype),
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
    BK = group_size
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

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(Tp // BT, Np // BN, n_k),
        in_specs=[
            pl.BlockSpec((BT, BK), lambda t, n, k: (t, k)),
            pl.BlockSpec((BK, BN), lambda t, n, k: (k, n)),
            pl.BlockSpec((1, BN), lambda t, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((BT, BN), lambda t, n, k: (t, n)),
        out_shape=jax.ShapeDtypeStruct((Tp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((BT, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, scale)
    return out[:T, :N]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
