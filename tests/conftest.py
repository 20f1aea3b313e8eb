"""Test harness: force CPU backend with 8 virtual devices so the full SPMD/TP
logic is unit-testable without TPU hardware (SURVEY.md §4.6)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin (and a sitecustomize
# may have force-registered it); an in-process config update reliably pins the
# test suite to the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from nanovllm_tpu.config import ModelConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    """A Qwen3-shaped toy model small enough for CPU tests."""
    return ModelConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=2048,
        tie_word_embeddings=True,
        eos_token_id=0,
    )


@pytest.fixture(scope="session")
def tiny_checkpoint(tiny_config, tmp_path_factory):
    """Synthetic HF-layout checkpoint on disk for loader/engine tests."""
    from nanovllm_tpu.utils.loader import save_synthetic_checkpoint

    path = tmp_path_factory.mktemp("ckpt") / "tiny-qwen3"
    save_synthetic_checkpoint(str(path), tiny_config, seed=0)
    return str(path)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
