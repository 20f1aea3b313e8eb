"""Multi-host helpers on the single-process virtual mesh (full multi-host
needs real pods; the dryrun driver covers the sharding compile path)."""

import jax

from nanovllm_tpu.parallel.distributed import (broadcast_step_plan,
                                               init_distributed,
                                               make_multihost_mesh)


def test_single_process_passthrough():
    assert init_distributed() == 0
    assert broadcast_step_plan(b"plan", is_source=True) == b"plan"


def test_multihost_mesh_degenerates_locally():
    mesh = make_multihost_mesh(data=2, model=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    mesh = make_multihost_mesh()  # defaults: 1 data x all devices
    assert mesh.devices.size == len(jax.devices())
