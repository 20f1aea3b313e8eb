"""Hardware probe: plane-major page row writes.

Plane-major rs pages [P, planes, ps, D] int8 need the decode store to write
one token's rows at a DYNAMIC ps position: dst = pool.at[page, :, pos]
([planes, D], strided) — a dynamic offset on the second-minor (sublane)
dim, which Mosaic rejects for packed bf16 ((2,1): "must be provably even").
int8 packs (4,1); does it slice at arbitrary pos?

  timeout 300 python tools/planerow_probe.py
"""

import sys

sys.path.insert(0, ".")
import nanovllm_tpu

nanovllm_tpu.enable_persistent_jit_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, PLANES, PS, D = 8, 3, 64, 128


def _kernel(page_ref, pos_ref, rows_hbm, pool_in, pool_out, sem):
    for j in range(3):
        pltpu.make_async_copy(
            rows_hbm.at[:, j],                      # [planes, D]
            pool_out.at[page_ref[j], :, pos_ref[j]],
            sem).start()
    for j in range(3):
        pltpu.make_async_copy(
            rows_hbm.at[:, j],
            pool_out.at[page_ref[j], :, pos_ref[j]],
            sem).wait()


@jax.jit
def write_rows(pool, rows, pages, poss):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
    )(pages, poss, rows, pool)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    pool = rng.integers(-100, 100, (P, PLANES, PS, D)).astype(np.int8)
    rows = rng.integers(-100, 100, (PLANES, 3, D)).astype(np.int8)
    pages = np.asarray([2, 5, 5], np.int32)
    poss = np.asarray([7, 0, 63], np.int32)   # odd / page-start / page-end
    out = np.asarray(write_rows(jnp.asarray(pool), jnp.asarray(rows),
                                jnp.asarray(pages), jnp.asarray(poss)))
    ref = pool.copy()
    for j in range(3):
        ref[pages[j], :, poss[j]] = rows[:, j]
    print("plane-major dynamic row write: "
          + ("OK" if np.array_equal(out, ref) else "MISMATCH"), flush=True)


if __name__ == "__main__":
    main()
