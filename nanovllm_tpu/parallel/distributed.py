"""Multi-host SPMD: process initialization, hybrid DCN×ICI meshes, and the
lockstep-controller contract.

The reference is single-host by construction — NCCL over
``tcp://localhost:2333`` with one worker process per TP rank and a
SharedMemory control plane (reference: nanovllm/engine/model_runner.py:26-28,
67-115). The TPU-native replacement has no hand-rolled backend at all:

- ``init_distributed()`` wraps ``jax.distributed.initialize`` (GKE/TPU-VM
  environments autodetect coordinator/process_id/local devices).
- ``make_multihost_mesh()`` builds a hybrid mesh: the ``data`` axis spans
  hosts over DCN (cheap, per-replica traffic only) and the ``model`` axis
  stays inside a slice on ICI (per-layer collectives ride the fast fabric).
  ``ShardingPlan`` (parallel/sharding.py) works unchanged on it.

Lockstep controller contract (multi-host continuous batching): under
multi-controller JAX every process must enter the *same* jitted computation
with the same static shapes each step. The scheduler therefore runs only on
process 0 and its per-step decision — bucketed batch metadata, a few KB —
is broadcast via ``broadcast_step_plan`` before each dispatch. Sampling is
SPMD (every host computes the same tokens for its shard), so no output
gather is needed; only the host-side scheduler state lives on process 0.
"""

import jax
import numpy as np

from nanovllm_tpu.parallel.sharding import make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize the JAX distributed runtime (no-op if single-process or
    already initialized). Returns this process's id."""
    if jax.process_count() > 1:
        return jax.process_index()
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def make_multihost_mesh(data: int | None = None, model: int | None = None):
    """Hybrid DCN×ICI mesh: ``data`` replicas across hosts (DCN), ``model``
    shards within a host/slice (ICI). Defaults: one data replica per process,
    model = local device count.

    Uses ``mesh_utils.create_hybrid_device_mesh`` when spanning processes so
    device order matches the physical topology; degenerates to the local mesh
    in single-process runs (tests, one host).
    """
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    if data is None:
        data = n_proc
    if model is None:
        model = (n_proc * n_local) // data
    if n_proc == 1:
        return make_mesh(data, model)
    from jax.experimental import mesh_utils
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(data // n_proc if data % n_proc == 0 else 1, model),
        dcn_mesh_shape=(n_proc if data % n_proc == 0 else data, 1),
    )
    return jax.sharding.Mesh(devices.reshape(data, model), ("data", "model"))


# Fixed plan-buffer size: every process must present the same shape to the
# collective (the reference's SharedMemory control plane is likewise a fixed
# 1 MiB segment, reference: model_runner.py:67).
PLAN_BUFFER_SIZE = 1 << 20


def broadcast_step_plan(plan_bytes: bytes, is_source: bool) -> bytes:
    """Broadcast the controller's per-step batch plan to every process
    (multihost_utils piggybacks on the ICI/DCN fabric; a few KB per step).
    In single-process runs this is the identity."""
    if jax.process_count() == 1:
        return plan_bytes
    assert len(plan_bytes) <= PLAN_BUFFER_SIZE - 8
    from jax.experimental import multihost_utils
    payload = np.zeros(PLAN_BUFFER_SIZE, np.uint8)
    if is_source:
        payload[:8] = np.array([len(plan_bytes)], np.int64).view(np.uint8)
        payload[8:8 + len(plan_bytes)] = np.frombuffer(plan_bytes, np.uint8)
    out = multihost_utils.broadcast_one_to_all(payload, is_source=is_source)
    n = int(out[:8].view(np.int64)[0])
    return out[8:8 + n].tobytes()
