"""Quantization experiment harness: MMLU / PPL / throughput / matmul-error
grids with resumable JSONL results.

Port of the reference harness (reference: experiments.py:33-508): the same
CLI (``--real --quant {tensor,row,group,smooth} --dtype {bf16,int8,fp8}
--group-size --test {mmlu,ppl,throughput,matmul} --save``), the same
``ExperimentResults`` semantics (dedup/update by config key, atomic
tmp-file-replace JSONL rewrite), and the same four experiments, driving the
TPU engine instead of CUDA. ``--quant smooth`` maps to dynamic-activation
per-row W8A8 (the semantics of the reference's torchao
``Int8DynamicActivationInt8WeightConfig``, reference: quantization.py:516-524,
without the torch dependency)."""

import argparse
import json
import os
import random
import time
from datetime import datetime
from functools import partial
from pathlib import Path

# The experiment grid is keyed by these config fields: one JSONL row per
# unique combination, re-running a combination replaces its row in place.
# (kv_dtype extends the reference's key set — KV-cache quantization is this
# framework's own knob and its rows must not collide with the weight grid.)
KEY_FIELDS = ("test", "real", "quant", "dtype", "group_size", "kv_dtype")


class ExperimentResults:
    """Resumable JSONL experiment-result store.

    Same resume semantics as the reference harness (dedup/update keyed on
    the run's config; atomic rewrite so an interrupted run never corrupts
    prior rows — reference: experiments.py:33-101), reworked mechanics:
    the key is an explicit field tuple (``KEY_FIELDS``), rows keep
    first-seen order, and ``save_or_update`` is the single write entry.
    """

    def __init__(self, filepath):
        self.filepath = Path(filepath)
        prior = []
        if self.filepath.exists():
            with open(self.filepath) as f:
                prior = [json.loads(line) for line in f if line.strip()]
            print(f"resuming: {len(prior)} prior results in {self.filepath}")
        self.rows = {self.key_of(r): r for r in prior}

    @staticmethod
    def key_of(row: dict) -> tuple:
        return tuple(str(row.get(k)) for k in KEY_FIELDS)

    def save_or_update(self, result: dict) -> None:
        row = dict(result, timestamp=datetime.now().isoformat())
        key = self.key_of(row)
        verb = "updated" if key in self.rows else "saved"
        self.rows[key] = row
        tmp = self.filepath.with_name(self.filepath.name + ".tmp")
        tmp.write_text("".join(json.dumps(r, ensure_ascii=False) + "\n"
                               for r in self.rows.values()))
        os.replace(tmp, self.filepath)
        print(f"result {verb} → {self.filepath}")

    def exists(self, test, real, quant, dtype, group_size=None,
               kv_dtype="auto") -> bool:
        # kv_dtype defaults to "auto" to match rows written by the harness
        # (_base_result carries args.kv_dtype, whose argparse default is
        # "auto") — a default probe must be able to match a default row
        probe = dict(zip(KEY_FIELDS,
                         (test, real, quant, dtype, group_size, kv_dtype),
                         strict=True))
        return self.key_of(probe) in self.rows


def _base_result(args):
    return {
        "test": args.test, "real": args.real, "quant": args.quant,
        "dtype": args.dtype,
        "group_size": args.group_size if args.quant == "group" else None,
        "kv_dtype": args.kv_dtype,
    }


def mmlu(args, quant_kwargs, results_manager):
    import test_mmlu
    r = test_mmlu.main(quant_kwargs=quant_kwargs)
    result = _base_result(args) | {
        "accuracy": r["accuracy"], "correct": r["correct"], "total": r["total"],
        "time": r["time"], "samples_per_sec": r["samples_per_sec"],
        "synthetic_data": r["synthetic_data"],
    }
    results_manager.save_or_update(result)


def wikitext(args, quant_kwargs, results_manager):
    import test_ppl
    r = test_ppl.main(quant_kwargs=quant_kwargs)
    result = _base_result(args) | {
        "ppl": r["ppl"], "total_tokens": r["total_tokens"], "time": r["time"],
        "synthetic_data": r["synthetic_data"],
    }
    results_manager.save_or_update(result)


def throughput(args, quant_kwargs, results_manager):
    """Separate prefill / decode throughput on repeated filler text
    (reference: experiments.py:263-342)."""
    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.utils.data import SyntheticTokenizer
    from nanovllm_tpu.utils.model_path import get_model_path

    llm = LLM(get_model_path(), max_model_len=4096, **quant_kwargs)
    if llm.tokenizer is None:
        llm.tokenizer = SyntheticTokenizer(llm.config.hf_config.vocab_size,
                                           llm.config.hf_config.eos_token_id)
    random.seed(42)
    num_samples = args.num_samples
    prompt_length = args.prompt_length

    prompts = []
    for _ in range(num_samples):
        fake_text = "The quick brown fox jumps over the lazy dog. " * (prompt_length // 10 + 1)
        prompts.append(fake_text[: prompt_length * 3])

    print(f"prefill throughput: {num_samples} samples, ~{prompt_length} tokens each")
    t = time.time()
    llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=1), use_tqdm=True)
    elapsed_prefill = time.time() - t
    prefill_samples_per_sec = num_samples / elapsed_prefill
    prefill_tokens_per_sec = num_samples * prompt_length / elapsed_prefill
    print(f"  {elapsed_prefill:.2f}s, {prefill_samples_per_sec:.2f} samples/s, "
          f"{prefill_tokens_per_sec:.2f} tok/s")

    print(f"decode throughput: {num_samples} samples x {args.generate_length} tokens")
    short_prompts = [p[: args.generate_prompt_length] for p in prompts]
    t = time.time()
    outs = llm.generate(short_prompts,
                        SamplingParams(temperature=0.0, max_tokens=args.generate_length,
                                       ignore_eos=True), use_tqdm=True)
    elapsed_decode = time.time() - t
    total_generated = sum(len(o["token_ids"]) for o in outs)
    decode_tokens_per_sec = total_generated / elapsed_decode
    print(f"  {elapsed_decode:.2f}s, {total_generated} tokens, "
          f"{decode_tokens_per_sec:.2f} tok/s")

    result = _base_result(args) | {
        "num_samples": num_samples, "prompt_length": prompt_length,
        "generate_prompt_length": args.generate_prompt_length,
        "generate_length": args.generate_length,
        "prefill_time": elapsed_prefill,
        "prefill_samples_per_sec": prefill_samples_per_sec,
        "prefill_tokens_per_sec": prefill_tokens_per_sec,
        "decode_time": elapsed_decode,
        "decode_tokens_per_sec": decode_tokens_per_sec,
        "total_generated_tokens": total_generated,
    }
    results_manager.save_or_update(result)


def matmul_test(args, quant_kwargs, results_manager):
    """Quantization error of a plain matmul vs fp32 (reference:
    experiments.py:345-438)."""
    import jax
    import jax.numpy as jnp
    from nanovllm_tpu.ops import quantization as q

    M, N, K = args.matmul_shape
    dtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn, "bf16": None}[args.dtype]
    max_errors, mean_errors, rel_errors = [], [], []
    for i in range(args.num_tests):
        ka, kb = jax.random.split(jax.random.key(i))
        A = jax.random.normal(ka, (M, K), jnp.float32)
        B = jax.random.normal(kb, (K, N), jnp.float32)
        C_ref = A @ B
        if args.dtype == "bf16":
            C = (A.astype(jnp.bfloat16) @ B.astype(jnp.bfloat16)).astype(jnp.float32)
        elif args.real and args.quant == "row":
            a_q, sa = q.quant_act_per_row(A, dtype)
            b_q, sb = q.per_row_quant(B, dtype)
            C = q.w8a8_matmul(a_q, sa, b_q, sb, out_dtype=jnp.float32)
        elif args.real and args.quant == "group":
            b_q, sb = q.per_group_quant(B, args.group_size, dtype)
            C = q.weight_only_matmul(A, b_q, sb, args.group_size, jnp.float32)
        elif args.real:  # tensor
            b_q, sb = q.per_tensor_quant(B, dtype)
            C = q.weight_only_matmul(A, b_q, sb, None, jnp.float32)
        else:  # fake quant both operands (reference path, experiments.py:364-392)
            if args.quant == "row":
                A_t, B_t = q.fake_per_row_quant(A, dtype), q.fake_per_row_quant(B, dtype)
            elif args.quant == "group":
                A_t = q.fake_per_group_quant(A, args.group_size, dtype)
                B_t = q.fake_per_group_quant(B, args.group_size, dtype)
            else:
                A_t, B_t = q.fake_per_tensor_quant(A, dtype), q.fake_per_tensor_quant(B, dtype)
            C = A_t @ B_t
        err = jnp.abs(C - C_ref)
        max_errors.append(float(jnp.max(err)))
        mean_errors.append(float(jnp.mean(err)))
        rel_errors.append(float(jnp.mean(err) / (jnp.mean(jnp.abs(C_ref)) + 1e-9)))

    result = _base_result(args) | {
        "matmul_shape": [M, N, K], "num_tests": args.num_tests,
        "avg_max_error": sum(max_errors) / len(max_errors),
        "avg_mean_error": sum(mean_errors) / len(mean_errors),
        "avg_relative_error": sum(rel_errors) / len(rel_errors),
    }
    print(f"matmul {M}x{N}x{K}: mean abs err {result['avg_mean_error']:.4f}, "
          f"rel {result['avg_relative_error']:.4f}")
    results_manager.save_or_update(result)


def build_quant_kwargs(args) -> dict:
    """Map the reference CLI surface onto engine Config kwargs
    (reference: experiments.py:462-495 → nanovllm/config.py:22-25)."""
    from nanovllm_tpu.ops import quantization as q

    linear_dtype = {"bf16": "bfloat16", "int8": "int8", "fp8": "fp8"}[args.dtype]
    if args.quant is None:
        return {"linear_dtype": linear_dtype} if args.dtype != "bf16" else {}
    if args.real:
        quant_type = {"tensor": "per_tensor", "row": "per_row",
                      "group": "per_group", "smooth": "smoothquant"}[args.quant]
        return {"quant_type": quant_type, "linear_dtype": linear_dtype,
                "group_size": args.group_size}
    assert args.quant != "smooth", "smoothquant must be real (add --real)"
    dtype = q.storage_dtype(linear_dtype)
    fn = {
        "tensor": partial(q.fake_per_tensor_quant, dtype=dtype),
        "row": partial(q.fake_per_row_quant, dtype=dtype),
        "group": partial(q.fake_per_group_quant, group_size=args.group_size, dtype=dtype),
    }[args.quant]
    return {"weight_quant_fn": fn, "linear_dtype": "bfloat16"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--real", action="store_true", default=False)
    parser.add_argument("--quant", type=str, default=None,
                        choices=["tensor", "row", "group", "smooth"])
    parser.add_argument("--dtype", type=str, default="bf16",
                        choices=["bf16", "int8", "fp8"])
    parser.add_argument("--group-size", type=int, default=64,
                        choices=[64, 128, 256, 512])
    parser.add_argument("--test", type=str, default="mmlu",
                        choices=["mmlu", "ppl", "throughput", "matmul"])
    parser.add_argument("--save", type=str, default="results.jsonl")
    # throughput test
    parser.add_argument("--num-samples", type=int, default=100)
    parser.add_argument("--prompt-length", type=int, default=1000)
    parser.add_argument("--generate-prompt-length", type=int, default=1)
    parser.add_argument("--generate-length", type=int, default=1000)
    # matmul test
    parser.add_argument("--matmul-shape", type=int, nargs=3, default=[4096, 4096, 4096])
    parser.add_argument("--num-tests", type=int, default=10)
    # KV-cache quantization (extension beyond the reference, which reserves
    # the knob but never implements it)
    parser.add_argument("--kv-dtype", type=str, default="auto",
                        choices=["auto", "int8", "fp8", "int8_rs", "int4"])
    args = parser.parse_args()

    print(f"test: {args.test}, real: {args.real}, quant: {args.quant}, "
          f"dtype: {args.dtype}"
          + (f" group size: {args.group_size}" if args.quant == "group" else ""))
    results_manager = ExperimentResults(args.save)
    quant_kwargs = build_quant_kwargs(args)
    if args.kv_dtype != "auto":
        quant_kwargs["kv_cache_dtype"] = args.kv_dtype

    if args.test == "mmlu":
        mmlu(args, quant_kwargs, results_manager)
    elif args.test == "ppl":
        wikitext(args, quant_kwargs, results_manager)
    elif args.test == "throughput":
        throughput(args, quant_kwargs, results_manager)
    elif args.test == "matmul":
        matmul_test(args, quant_kwargs, results_manager)


if __name__ == "__main__":
    main()
