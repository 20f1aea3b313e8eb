"""Multi-host lockstep controller: a real 2-process CPU cluster running
``LLM.generate`` end-to-end, outputs identical across processes and equal to
a single-process run.

This covers the control plane the reference implements with SharedMemory +
Events across TP worker processes (reference:
nanovllm/engine/model_runner.py:67-115): here process 0 schedules and
broadcasts packed plans (parallel/distributed.PlanChannel) and every process
replays the same jitted steps over a global ("data","model") mesh, with the
"model" axis spanning both processes (collectives cross the process boundary
via gloo on CPU, ICI/DCN on TPU pods).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.config import ModelConfig

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


@pytest.fixture(scope="module")
def tp_checkpoint(tmp_path_factory):
    """Synthetic checkpoint shaped to shard over 4 model-parallel devices."""
    from nanovllm_tpu.utils.loader import save_synthetic_checkpoint

    cfg = ModelConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, max_position_embeddings=2048, tie_word_embeddings=True,
        eos_token_id=0)
    path = tmp_path_factory.mktemp("ckpt") / "tp-qwen3"
    save_synthetic_checkpoint(str(path), cfg, seed=0)
    return str(path)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_lockstep_generate(tp_checkpoint, tmp_path):
    nproc = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             tp_checkpoint, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    # every process returns the same outputs (workers get them via PLAN_DONE)
    assert results[0] == results[1]
    assert len(results[0]) == 3 and all(len(t) == 20 for t in results[0])

    # ... and they match a single-process engine over the same 4-device mesh
    from nanovllm_tpu.parallel.sharding import make_mesh
    import jax
    mesh = make_mesh(1, 4, devices=jax.devices("cpu")[:4])
    llm = LLM(tp_checkpoint, mesh=mesh, attention_impl="xla",
              dtype="float32", max_model_len=256, max_num_batched_tokens=256,
              max_num_seqs=8)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12, 13, 14, 15, 16, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    ref = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]
    assert results[0] == ref


def test_two_process_dp_replicas_generate(tp_checkpoint, tmp_path):
    """Multi-host DP (VERDICT r3 item 7): 2 processes x data_parallel_size=4
    (2 replicas per process on its local devices, TP=1) through
    MultiHostDPEngine. No lockstep channel; outputs allgathered. Every
    process returns the full input-ordered result list, equal to a
    single-process single-engine run."""
    nproc = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"dp_out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             tp_checkpoint, str(out), "dp"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert results[0] == results[1]
    assert len(results[0]) == 3 and all(len(t) == 20 for t in results[0])

    llm = LLM(tp_checkpoint, attention_impl="xla", dtype="float32",
              max_model_len=256, max_num_batched_tokens=256, max_num_seqs=8)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12, 13, 14, 15, 16, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    ref = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]
    assert results[0] == ref
