"""Subprocess entry for the multi-host lockstep test (tests/test_multihost.py).

Runs one JAX process of an N-process CPU cluster (2 virtual devices each),
builds the engine over the global mesh, and generates. Every process runs
this same script SPMD-style; process 0 is the lockstep controller.

Usage: python multihost_worker.py <pid> <nproc> <port> <ckpt> <out.json> [mode]

mode "tp" (default): one engine with the model axis spanning both processes
(lockstep controller). mode "dp": data_parallel_size = nproc independent
per-process replicas (MultiHostDPEngine) — no lockstep, outputs allgathered.
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    ckpt, out_path = sys.argv[4], sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "tp"

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 2 * nproc

    from nanovllm_tpu import LLM, SamplingParams

    if mode == "tp":
        llm = LLM(ckpt, tensor_parallel_size=2 * nproc, attention_impl="xla",
                  dtype="float32", max_model_len=256,
                  max_num_batched_tokens=256, max_num_seqs=8,
                  enforce_eager=False)
    else:
        assert mode == "dp"
        llm = LLM(ckpt, data_parallel_size=2 * nproc, tensor_parallel_size=1,
                  attention_impl="xla", dtype="float32", max_model_len=256,
                  max_num_batched_tokens=256, max_num_seqs=8)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12, 13, 14, 15, 16, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    outputs = llm.generate(prompts, sp, use_tqdm=False)
    with open(out_path, "w") as f:
        json.dump([o["token_ids"] for o in outputs], f)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
