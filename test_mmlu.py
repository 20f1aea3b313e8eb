"""MMLU 5-shot accuracy through the serving engine.

Port of the reference MMLU harness (reference: test_mmlu.py:20-74):
1000 shuffled samples (seed 42), 5-shot prompts from the dev split, greedy
single-token generation, accuracy scored on the first letter of the
completion. Runs hermetically on synthetic data/tokenizer when the HF hub is
unreachable (results then marked synthetic — not comparable to REPORT.md)."""

import time


def main(model_path=None, quant_kwargs=None, num_samples=1000):
    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.utils.data import build_mmlu_prompts, load_mmlu
    from nanovllm_tpu.utils.model_path import get_model_path

    model_path = model_path or get_model_path()
    llm = LLM(model_path, max_model_len=4096, **(quant_kwargs or {}))

    dataset, dev_dataset, synthetic = load_mmlu(num_samples)
    prompts, answers = build_mmlu_prompts(dataset, dev_dataset)
    if llm.tokenizer is None:
        from nanovllm_tpu.utils.data import SyntheticTokenizer
        llm.tokenizer = SyntheticTokenizer(llm.config.hf_config.vocab_size,
                                           llm.config.hf_config.eos_token_id)
        synthetic = True

    sampling_params = SamplingParams(temperature=0.0, max_tokens=1)
    t = time.time()
    outputs = llm.generate(prompts, sampling_params, use_tqdm=True)
    elapsed = time.time() - t

    correct = 0
    for output, true_answer in zip(outputs, answers):
        pred = output["text"].strip()[0].upper() if output["text"].strip() else ""
        if pred == true_answer:
            correct += 1
    accuracy = correct / len(answers) * 100
    throughput = len(prompts) / elapsed
    tag = " (SYNTHETIC fallback — not comparable)" if synthetic else ""
    print(f"\nAccuracy: {accuracy:.2f}% ({correct}/{len(answers)}){tag}")
    print(f"Time: {elapsed:.2f}s, Throughput: {throughput:.2f} samples/s")
    return {"accuracy": accuracy, "correct": correct, "total": len(answers),
            "time": elapsed, "samples_per_sec": throughput,
            "synthetic_data": synthetic}


if __name__ == "__main__":
    main()
