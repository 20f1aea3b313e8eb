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
    """Global ``("data","model")`` mesh over every device in the cluster.

    When the ``model`` axis fits inside one host's slice and ``data`` splits
    evenly across hosts, uses ``mesh_utils.create_hybrid_device_mesh`` so the
    per-layer TP collectives ride ICI and only per-replica traffic crosses
    DCN. Otherwise (model axis spanning hosts, or non-TPU device sets with no
    slice topology) falls back to process-ordered global device order — each
    host's local devices are contiguous along ``model``, so intra-host hops
    still dominate.
    """
    n_proc = jax.process_count()
    n_total = jax.device_count()
    n_local = jax.local_device_count()
    if model is None:
        model = n_total // (data or n_proc)
    if data is None:
        data = n_total // model
    assert data * model == n_total, \
        f"data({data}) x model({model}) != device_count({n_total})"
    if (n_proc > 1 and model <= n_local and n_local % model == 0
            and data % n_proc == 0):
        try:
            from jax.experimental import mesh_utils
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(data // n_proc, model),
                dcn_mesh_shape=(n_proc, 1))
            return jax.sharding.Mesh(devices, ("data", "model"))
        except Exception:
            pass  # no slice topology attrs (CPU processes): process order
    return make_mesh(data, model)


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


# ------------------------------------------------------------ plan channel
# Plan kinds carried in the header (the lockstep-controller wire protocol).
PLAN_STEP = 1   # one device dispatch: ints + packed i32/f32 buffers
PLAN_DONE = 2   # end of a generate(): payload = pickled outputs
PLAN_SYNC = 3   # init-time handshake: ints = config fingerprint

# Padded payload sizes so each broadcast shape compiles once. The largest
# covers a max prefill buffer (3*16384 i32) plus the fixed sections; payloads
# beyond the largest bucket (e.g. PLAN_DONE outputs of a huge batch) are
# chunked at the largest bucket size — no silent cap.
_PAYLOAD_BUCKETS = (1 << 12, 1 << 15, 1 << 18, 1 << 21, 1 << 24)


def _payload_chunks(total: int) -> list[int]:
    """Chunk sizes whose broadcasts cover ``total`` payload bytes: one bucket
    when it fits, else max-bucket chunks plus a bucketed tail. Both ends of
    the channel derive the identical split from the header length alone."""
    top = _PAYLOAD_BUCKETS[-1]
    sizes = []
    while total > top:
        sizes.append(top)
        total -= top
    sizes.append(next(b for b in _PAYLOAD_BUCKETS if b >= total))
    return sizes


class PlanChannel:
    """Controller→worker broadcast channel for per-step batch plans.

    The multi-host replacement for the reference's SharedMemory + Event RPC
    (reference: nanovllm/engine/model_runner.py:67-115): process 0 runs the
    scheduler and broadcasts each step's packed metadata before dispatch;
    every process then enters the same jitted computation in lockstep.
    Transport is ``multihost_utils.broadcast_one_to_all`` — a fixed [8] i32
    header, then (when non-empty) a payload padded to a static bucket so
    every broadcast shape compiles once.
    """

    def __init__(self, is_source: bool):
        self.is_source = is_source

    def _bcast(self, arr):
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.broadcast_one_to_all(
            arr, is_source=self.is_source))

    def send(self, kind: int, ints: tuple = (), payload: bytes = b"") -> None:
        assert self.is_source, "only the controller sends plans"
        assert len(ints) <= 6
        header = np.zeros(8, np.int32)
        header[0] = kind
        header[1] = len(payload)
        header[2:2 + len(ints)] = ints
        self._bcast(header)
        if payload:
            off = 0
            for bucket in _payload_chunks(len(payload)):
                part = payload[off:off + bucket]
                buf = np.zeros(bucket, np.uint8)
                buf[:len(part)] = np.frombuffer(part, np.uint8)
                self._bcast(buf)
                off += bucket

    def recv(self) -> tuple[int, tuple, bytes]:
        assert not self.is_source, "the controller does not recv plans"
        header = self._bcast(np.zeros(8, np.int32))
        kind, plen = int(header[0]), int(header[1])
        ints = tuple(int(x) for x in header[2:8])
        payload = b""
        if plen:
            parts = [self._bcast(np.zeros(bucket, np.uint8)).tobytes()
                     for bucket in _payload_chunks(plen)]
            payload = b"".join(parts)[:plen]
        return kind, ints, payload
