"""Offline generation example (reference: example.py).

With a real checkpoint directory (config.json + *.safetensors + tokenizer),
pass it via --model. Without one (this environment has no hub access), the
script writes a synthetic Qwen3-0.6B-shaped checkpoint and generates from
token-id prompts.
"""

import argparse
import os

from nanovllm_tpu import LLM, SamplingParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.path.expanduser("~/huggingface/Qwen3-0.6B/"))
    ap.add_argument("--max-model-len", type=int, default=4096)
    args = ap.parse_args()

    path = args.model
    if not os.path.isdir(path):
        from nanovllm_tpu.config import ModelConfig
        from nanovllm_tpu.utils.loader import save_synthetic_checkpoint
        path = "/tmp/nanovllm_tpu_synth/qwen3-0.6b"
        if not os.path.isdir(path):
            print(f"no checkpoint at {args.model}; writing synthetic Qwen3-0.6B to {path}")
            save_synthetic_checkpoint(path, ModelConfig(), seed=0)

    llm = LLM(path, max_model_len=args.max_model_len)
    sampling_params = SamplingParams(temperature=0.6, max_tokens=64)

    if llm.tokenizer is not None:
        prompts = ["introduce yourself", "list all prime numbers within 100"]
        prompts = [
            llm.tokenizer.apply_chat_template(
                [{"role": "user", "content": p}],
                tokenize=False, add_generation_prompt=True)
            for p in prompts
        ]
    else:
        prompts = [[1, 2, 3, 4, 5], [42, 43, 44]]

    outputs = llm.generate(prompts, sampling_params)
    for prompt, output in zip(prompts, outputs):
        print(f"\nPrompt: {prompt!r}")
        print(f"Completion: {output['text']!r} ({len(output['token_ids'])} tokens)")


if __name__ == "__main__":
    main()
