"""Offline throughput benchmark (reference: bench.py).

Workload parity: 256 sequences, random input/output lengths in [100, 1024],
ignore_eos, throughput = sum(max_tokens) / wall time. Reference number to beat:
1434.13 tok/s (Qwen3-0.6B on RTX 4070 Laptop, README.md:57-61).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time
from random import randint, seed

BASELINE_TOK_S = 1434.13  # reference README.md:57-61


def main():
    from nanovllm_tpu.utils.model_path import get_model_path
    from nanovllm_tpu import LLM, SamplingParams

    seed(0)
    num_seqs = int(os.environ.get("BENCH_NUM_SEQS", 256))
    max_input_len = int(os.environ.get("BENCH_MAX_INPUT", 1024))
    max_output_len = int(os.environ.get("BENCH_MAX_OUTPUT", 1024))
    # BENCH_MIN_INPUT=2048 BENCH_MAX_INPUT=3072 BENCH_MIN_OUTPUT=512 gives
    # the capacity-bound long-context variant: admission is limited by KV
    # pages, so sub-byte KV raises decode occupancy (not just bandwidth)
    min_input_len = int(os.environ.get("BENCH_MIN_INPUT", 100))
    # BENCH_MIN_OUTPUT=1 with BENCH_MAX_OUTPUT=1 gives a prefill-dominated
    # run over the bench's random (prefix-cache-miss) prompts — used to
    # isolate the prefill path (e.g. the row-scale scratch-dequant tax);
    # experiments.py's prefill test reuses one filler text, so its prefills
    # after the first are pure prefix-cache hits.
    min_output_len = int(os.environ.get("BENCH_MIN_OUTPUT", 100))
    min_output_len = min(min_output_len, max_output_len)

    # int4 KV (nibble-packed, per-(row, head) scales) is this framework's
    # shipped serving config as of round 4: the in-house quantized ragged
    # kernel reads the packed pool at 0.72x the library int8 kernel's
    # decode wall (tools/ragged_quant_validate.py), measured +17.9% on this
    # bench back-to-back vs int8 (5837 -> 6881 tok/s). Quality is gated by
    # tests/test_kv_quality.py (logit-KL vs bf16 KV incl. the V-clipping
    # hazard the per-row scales remove). BENCH_KV_DTYPE=int8 restores the
    # round-3 config; =auto benches the bf16 cache.
    kv_dtype = os.environ.get("BENCH_KV_DTYPE", "int4")
    # Admission reserves prompt + 0.5*max_tokens of KV per sequence: the
    # workload is KV-capacity-bound, and half-reservation (the expectation of
    # the uniform-random output lengths) nearly doubles decode batch occupancy
    # (93 -> ~180 lanes avg); sequences that outrun it preempt youngest-first
    # and recover KV via the prefix cache. Measured: 3394 (f=1.0) -> 4960
    # (f=0.5) tok/s back-to-back; f=0.35 was within noise of f=0.5.
    reserve = float(os.environ.get("BENCH_KV_RESERVE", 0.5))
    # BENCH_ADAPTIVE_K=0 disables the adaptive decode-scan-depth policy for
    # the EOS-workload A/B (full-K scans regardless of observed stop hazard)
    adaptive = os.environ.get("BENCH_ADAPTIVE_K", "1") != "0"
    # BENCH_DECODE_K overrides the decode scan depth (A/B tool)
    decode_k = int(os.environ.get("BENCH_DECODE_K", 16))
    llm = LLM(get_model_path(), max_model_len=4096, kv_cache_dtype=kv_dtype,
              kv_reserve_fraction=reserve, adaptive_decode_steps=adaptive,
              decode_steps_per_call=decode_k)

    # BENCH_EOS_MEAN=<n>: EOS-terminated workload variant — each sequence
    # stops unplannably after ~Geometric(1/n) tokens (stop_after stands in
    # for EOS: the scheduler cannot see it coming), measuring speculative
    # decode waste and the adaptive-K policy. 0 = reference parity workload.
    eos_mean = int(os.environ.get("BENCH_EOS_MEAN", 0))

    prompt_token_ids = [[randint(0, 10000)
                         for _ in range(randint(min_input_len, max_input_len))]
                        for _ in range(num_seqs)]
    if eos_mean:
        from random import random
        from math import ceil, log
        sampling_params = [SamplingParams(
            temperature=0.6, ignore_eos=True, max_tokens=max_output_len,
            stop_after=min(max(ceil(log(random()) / log(1 - 1 / eos_mean)), 1),
                           max_output_len))
            for _ in range(num_seqs)]
    else:
        sampling_params = [SamplingParams(temperature=0.6, ignore_eos=True,
                                          max_tokens=randint(min_output_len,
                                                             max_output_len))
                           for _ in range(num_seqs)]

    # warmup: compiles the prefill/decode buckets
    llm.generate([[randint(0, 10000) for _ in range(128)]],
                 SamplingParams(max_tokens=128, ignore_eos=True), use_tqdm=False)

    t = time.time()
    outs = llm.generate(prompt_token_ids, sampling_params, use_tqdm=False)
    t = time.time() - t
    if eos_mean:
        # EOS workload: throughput counts tokens actually *delivered*;
        # waste shows up as a lower number, not a hidden discount
        total_tokens = sum(len(o["token_ids"]) for o in outs)
        m = llm.metrics
        print(json.dumps({
            "metric": "offline_throughput_eos",
            "value": round(total_tokens / t, 2),
            "unit": "tok/s",
            "vs_baseline": 0.0,
            "decode_tokens_wasted": m["decode_tokens_wasted"],
            "decode_tokens_used": m["decode_tokens_used"],
            "unplanned_finishes": m["unplanned_finishes"],
        }))
        return
    total_tokens = sum(sp.max_tokens for sp in sampling_params)
    throughput = total_tokens / t
    # diagnostics (stderr; the driver consumes exactly one stdout JSON line):
    # avg decode lanes ≈ decode_tokens / (decode_calls * K) shows whether the
    # run is KV-capacity-bound (lanes << num_seqs) or chip-bound
    import sys
    m = dict(llm.metrics)
    # divide by the engine's actual scan-step count (adaptive decode-K runs
    # K/2 / K/4 scans under stop-hazard; a static K would understate lanes)
    if m.get("decode_scan_steps"):
        m["avg_decode_lanes"] = round(
            m["decode_tokens"] / m["decode_scan_steps"], 1)
    print(json.dumps({"bench_diag": m, "kv_dtype": kv_dtype,
                      "wall_s": round(t, 2)}), file=sys.stderr)
    print(json.dumps({
        "metric": "offline_throughput",
        "value": round(throughput, 2),
        "unit": "tok/s",
        "vs_baseline": round(throughput / BASELINE_TOK_S, 4),
    }))


if __name__ == "__main__":
    main()
