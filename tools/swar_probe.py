"""Hardware probe for the plane-major fused-page kernel primitives:

  1. value bitcast int8 [T, D] -> uint32 [T/4, D] -> SWAR nibble split ->
     bitcast back -> int8 subtract (packed domain)
  2. mid-dim strided ref load: bufs[buf, :, h] from [2, bkv, planes, ps, D]
     (per-head contiguous plane chunks across pages)

  timeout 300 python tools/swar_probe.py
"""

import sys

sys.path.insert(0, ".")
import nanovllm_tpu

nanovllm_tpu.enable_persistent_jit_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D = 256, 128
BKV, PLANES, PS = 4, 3, 64


def say(m):
    print(m, flush=True)


def _swar_kernel(b_ref, k_ref, v_ref):
    w = pltpu.bitcast(b_ref[...], jnp.uint32)            # [T/4, D]
    t = (w ^ jnp.uint32(0x80808080)) + jnp.uint32(0x08080808)
    k8 = t & jnp.uint32(0x0F0F0F0F)
    v8 = (t >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F)
    # packed int8 subtract doesn't legalize (arith.subi on int8); emit the
    # biased nibbles — the kernel folds the -8 into downstream f32/bf16 math
    k_ref[...] = pltpu.bitcast(k8, jnp.int8)
    v_ref[...] = pltpu.bitcast(v8, jnp.int8)


@jax.jit
def swar(b):
    return pl.pallas_call(
        _swar_kernel,
        out_shape=(jax.ShapeDtypeStruct((T, D), jnp.int8),
                   jax.ShapeDtypeStruct((T, D), jnp.int8)),
    )(b)


def _stride_kernel(bufs_ref, out_ref):
    acc = jnp.zeros((BKV * PS, D), jnp.float32)
    for h in range(PLANES):
        plane = bufs_ref[:, h].reshape(BKV * PS, D)      # strided mid-dim
        acc += plane.astype(jnp.float32) * (h + 1)
    out_ref[...] = acc


@jax.jit
def strided(bufs):
    return pl.pallas_call(
        _stride_kernel,
        out_shape=jax.ShapeDtypeStruct((BKV * PS, D), jnp.float32),
    )(bufs)


def main():
    say(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    k = rng.integers(-7, 8, (T, D)).astype(np.int8)
    v = rng.integers(-7, 8, (T, D)).astype(np.int8)
    b = (16 * v + k).astype(np.int8)
    ko, vo = swar(jnp.asarray(b))
    ok = (np.array_equal(np.asarray(ko).astype(np.int32) - 8, k)
          and np.array_equal(np.asarray(vo).astype(np.int32) - 8, v))
    say(f"probe 1 SWAR nibble split (biased): {'OK' if ok else 'MISMATCH'}")

    bufs = rng.integers(-100, 100, (BKV, PLANES, PS, D)).astype(np.int8)
    out = np.asarray(strided(jnp.asarray(bufs)))
    ref = sum((h + 1) * bufs[:, h].reshape(BKV * PS, D).astype(np.float32)
              for h in range(PLANES))
    say(f"probe 2 strided plane load: "
        f"{'OK' if np.array_equal(out, ref) else 'MISMATCH'}")


if __name__ == "__main__":
    main()
