"""Numeric tests for the experimental decode flash-attention kernel
(interpret mode on the CPU suite; see the module docstring for hardware
status). Oracle: per-head dense softmax over the gathered pages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.pallas.flash_decode import flash_decode_attention

Hq, Hk, D, PS = 16, 8, 128, 16
P, W = 64, 8


def _oracle(pages, q, table, L, h, g, scale):
    rows = pages[table].reshape(len(table) * PS, 2 * Hk, D)[:L]
    kk, vv = rows[:, 0::2, :], rows[:, 1::2, :]
    s = (kk[:, h] @ q) * scale
    p = np.exp(s - s.max())
    p /= p.sum()
    return p @ vv[:, h]


@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_flash_decode_matches_oracle(chunk):
    rng = np.random.default_rng(0)
    pages = jax.random.normal(jax.random.key(0), (P, PS, 2 * Hk, D), jnp.float32)
    B = 5
    q = jax.random.normal(jax.random.key(1), (B, Hq, D), jnp.float32)
    # edge cases: single token, page boundary, exact page, inactive, long
    kv_lens = np.array([1, 17, 16, 0, 100], np.int32)
    pi = np.zeros((B, W), np.int32)
    for i in range(B):
        pi[i] = rng.permutation(P)[:W]
    out = np.asarray(flash_decode_attention(
        q, pages, jnp.asarray(kv_lens), jnp.asarray(pi), sm_scale=0.0883,
        chunk=chunk, interpret=True))
    pages_np = np.asarray(pages)
    for i in range(B):
        if kv_lens[i] == 0:
            assert np.allclose(out[i], 0)
            continue
        for h in range(Hk):
            for g in range(2):
                ref = _oracle(pages_np, np.asarray(q[i, 2 * h + g]), pi[i],
                              kv_lens[i], h, g, 0.0883)
                np.testing.assert_allclose(out[i, 2 * h + g], ref, atol=2e-3)


def test_flash_decode_int8_scale():
    rng = np.random.default_rng(1)
    scale = 0.05
    raw = jax.random.normal(jax.random.key(2), (P, PS, 2 * Hk, D), jnp.float32)
    pages8 = jnp.clip(jnp.round(raw / scale), -127, 127).astype(jnp.int8)
    B = 2
    q = jax.random.normal(jax.random.key(3), (B, Hq, D), jnp.float32)
    kv_lens = np.array([33, 64], np.int32)
    pi = np.stack([rng.permutation(P)[:W] for _ in range(B)]).astype(np.int32)
    out = np.asarray(flash_decode_attention(
        q, pages8, jnp.asarray(kv_lens), jnp.asarray(pi), sm_scale=0.0883,
        kv_scale=scale, chunk=2, interpret=True))
    deq = np.asarray(pages8).astype(np.float32) * scale
    for i in range(B):
        for h in range(Hk):
            for g in range(2):
                ref = _oracle(deq, np.asarray(q[i, 2 * h + g]), pi[i],
                              kv_lens[i], h, g, 0.0883)
                np.testing.assert_allclose(out[i, 2 * h + g], ref, atol=5e-2)
