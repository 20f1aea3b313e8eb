"""Instrumented bench: where does wall time go at the engine level?

Monkeypatches the runner/engine hot points with timers and runs the bench
workload (scaled by env vars like bench.py). Prints a JSON breakdown:
host time in prefill dispatch, decode dispatch, materialize blocking, and
the prefill-waste factor (tokens computed / tokens needed).

Usage: [BENCH_NUM_SEQS=64] python tools/profile_bench.py
"""

import json
import os
import sys
import time
from random import randint, seed

sys.path.insert(0, ".")


def main():
    from nanovllm_tpu.utils.model_path import get_model_path
    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.engine.llm_engine import LLMEngine
    from nanovllm_tpu.engine.model_runner import ModelRunner

    seed(0)
    num_seqs = int(os.environ.get("BENCH_NUM_SEQS", 64))
    max_input_len = int(os.environ.get("BENCH_MAX_INPUT", 1024))
    max_output_len = int(os.environ.get("BENCH_MAX_OUTPUT", 1024))

    acc = {"prefill_dispatch_s": 0.0, "prefill_prepare_s": 0.0,
           "decode_dispatch_s": 0.0, "materialize_s": 0.0, "schedule_s": 0.0}

    rp, rd, mat = ModelRunner.run_prefill, ModelRunner.run_decode, \
        LLMEngine._materialize_one
    prep = ModelRunner.prepare

    def prepare(self, seqs, is_prefill=True):
        t = time.perf_counter()
        out = prep(self, seqs, is_prefill)
        acc["prefill_prepare_s"] += time.perf_counter() - t
        return out

    def run_prefill(self, seqs):
        t = time.perf_counter()
        out = rp(self, seqs)
        acc["prefill_dispatch_s"] += time.perf_counter() - t
        return out

    def run_decode(self, seqs, steps, num_steps):
        t = time.perf_counter()
        out = rd(self, seqs, steps, num_steps)
        acc["decode_dispatch_s"] += time.perf_counter() - t
        return out

    def materialize(self):
        t = time.perf_counter()
        mat(self)
        acc["materialize_s"] += time.perf_counter() - t

    ModelRunner.run_prefill = run_prefill
    ModelRunner.run_decode = run_decode
    ModelRunner.prepare = prepare
    LLMEngine._materialize_one = materialize

    llm = LLM(get_model_path(), max_model_len=4096,
              kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", "int8"),
              decode_steps_per_call=int(os.environ.get("BENCH_DECODE_STEPS", 16)),
              async_lag=int(os.environ.get("BENCH_ASYNC_LAG", 3)),
              kv_reserve_fraction=float(os.environ.get("BENCH_KV_RESERVE", 0.5)))

    prompt_token_ids = [[randint(0, 10000) for _ in range(randint(100, max_input_len))]
                        for _ in range(num_seqs)]
    sampling_params = [SamplingParams(temperature=0.6, ignore_eos=True,
                                      max_tokens=randint(100, max_output_len))
                       for _ in range(num_seqs)]

    llm.generate([[randint(0, 10000) for _ in range(128)]],
                 SamplingParams(max_tokens=128, ignore_eos=True), use_tqdm=False)
    for k in acc:
        acc[k] = 0.0
    for k in llm.metrics:
        llm.metrics[k] = 0

    t0 = time.time()
    llm.generate(prompt_token_ids, sampling_params, use_tqdm=False)
    wall = time.time() - t0

    total_out = sum(sp.max_tokens for sp in sampling_params)
    needed_prefill = sum(len(p) for p in prompt_token_ids)
    m = llm.metrics
    print(json.dumps({
        "wall_s": round(wall, 2),
        "throughput_tok_s": round(total_out / wall, 1),
        **{k: round(v, 2) for k, v in acc.items()},
        "other_s": round(wall - sum(acc.values()), 2),
        "prefill_calls": m["prefill_calls"],
        "decode_calls": m["decode_calls"],
        "prefill_tokens": m["prefill_tokens"],
        "prefill_tokens_needed": needed_prefill,
        "prefill_waste": round(m["prefill_tokens"] / max(needed_prefill, 1), 3),
        "decode_tokens": m["decode_tokens"],
        "decode_tokens_needed": total_out,
        "decode_waste": round(m["decode_tokens"] / max(total_out, 1), 3),
        "preemptions": m["preemptions"],
        "ms_per_prefill_call": round(1e3 * acc["prefill_dispatch_s"]
                                     / max(m["prefill_calls"], 1), 1),
        "ms_per_decode_call": round(1e3 * acc["decode_dispatch_s"]
                                    / max(m["decode_calls"], 1), 1),
    }))


if __name__ == "__main__":
    main()
