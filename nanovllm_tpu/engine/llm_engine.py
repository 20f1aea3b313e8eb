"""Engine loop: request intake → schedule → run → postprocess.

Capability parity with the reference LLMEngine (reference:
nanovllm/engine/llm_engine.py:15-93). No worker processes to spawn or tear
down — one JAX process drives the whole mesh — so ``exit`` is trivial and
there is no atexit choreography.
"""

import time
from dataclasses import fields

from tqdm.auto import tqdm

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams


class LLMEngine:
    def __init__(self, model, **kwargs):
        config_kwargs = {f.name: v for f in fields(Config) for k, v in kwargs.items() if f.name == k}
        config = Config(model, **config_kwargs)
        self.config = config
        mesh = kwargs.get("mesh")
        if mesh is None and config.tensor_parallel_size * config.data_parallel_size > 1:
            from nanovllm_tpu.parallel.sharding import make_mesh
            mesh = make_mesh(config.data_parallel_size, config.tensor_parallel_size)
        self.model_runner = ModelRunner(config, mesh=mesh)
        self.tokenizer = _load_tokenizer(config.model)
        if self.tokenizer is not None and config.eos == -1:
            config.eos = self.tokenizer.eos_token_id
        self.scheduler = Scheduler(config)

    def add_request(self, prompt, sampling_params: SamplingParams = SamplingParams()):
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompts require a tokenizer"
            prompt = self.tokenizer.encode(prompt)
        seq = Sequence(prompt, sampling_params, block_size=self.config.kvcache_block_size)
        self.scheduler.add(seq)

    def step(self):
        """One scheduling + execution step (reference: llm_engine.py:48-54).
        Returns (finished outputs, num_tokens) where num_tokens > 0 counts
        prefill tokens and < 0 is -(decode batch size)."""
        seqs, is_prefill = self.scheduler.schedule()
        token_ids = self.model_runner.run(seqs, is_prefill)
        self.scheduler.postprocess(seqs, token_ids)
        outputs = [(seq.seq_id, seq.completion_token_ids) for seq in seqs if seq.is_finished]
        num_tokens = sum(len(seq) - seq.num_cached_tokens for seq in seqs) if is_prefill else -len(seqs)
        return outputs, num_tokens

    def is_finished(self):
        return self.scheduler.is_finished()

    def exit(self):
        pass

    def generate(self, prompts, sampling_params, use_tqdm: bool = True) -> list[dict]:
        """Batch generation (reference: llm_engine.py:59-93): returns
        [{"text", "token_ids"}] ordered like the input prompts."""
        if use_tqdm:
            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        for prompt, sp in zip(prompts, sampling_params):
            self.add_request(prompt, sp)
        outputs = {}
        prefill_throughput = decode_throughput = 0.0
        while not self.is_finished():
            t = time.perf_counter()
            output, num_tokens = self.step()
            if use_tqdm:
                dt = time.perf_counter() - t
                if num_tokens > 0:
                    prefill_throughput = num_tokens / dt
                else:
                    decode_throughput = -num_tokens / dt
                pbar.set_postfix({"Prefill": f"{int(prefill_throughput)}tok/s",
                                  "Decode": f"{int(decode_throughput)}tok/s"})
            for seq_id, token_ids in output:
                outputs[seq_id] = token_ids
                if use_tqdm:
                    pbar.update(1)
        outputs = [outputs[seq_id] for seq_id in sorted(outputs)]
        decode = (self.tokenizer.decode if self.tokenizer is not None
                  else lambda ids: "")
        outputs = [{"text": decode(token_ids), "token_ids": token_ids}
                   for token_ids in outputs]
        if use_tqdm:
            pbar.close()
        return outputs


def _load_tokenizer(path: str):
    if not path:
        return None
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(path, local_files_only=True)
    except Exception:
        return None
