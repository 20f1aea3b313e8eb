"""Data parallelism: independent engine replicas over disjoint submeshes.

The reference exposes no data parallelism (its ``Config`` has only
``tensor_parallel_size``, reference: nanovllm/config.py:14); this is extension
territory. For LLM *serving*, DP is request-level parallelism: each replica
owns a full copy of the weights, its own KV page pool, and its own
continuous-batching scheduler — there is no per-layer communication to fuse,
so lock-stepping replicas inside one jit would only couple their schedules.
``DataParallelEngine`` therefore carves the local device set into
``data_parallel_size`` disjoint ``(1, tensor_parallel_size)`` submeshes,
builds one ``LLMEngine`` per submesh, round-robins requests across them, and
interleaves their ``step`` loops — each step is an async dispatch onto a
different device group, so replicas overlap on hardware while the host
multiplexes scheduling.
"""

from tqdm.auto import tqdm


class DataParallelEngine:
    """N engine replicas behind the LLMEngine generate() surface."""

    def __init__(self, model, **kwargs):
        import jax

        from nanovllm_tpu.engine.llm_engine import LLMEngine
        from nanovllm_tpu.parallel.sharding import make_mesh

        dp = kwargs.pop("data_parallel_size")
        tp = kwargs.get("tensor_parallel_size", 1)
        mesh = kwargs.pop("mesh", None)
        devices = (list(mesh.devices.flat) if mesh is not None
                   else jax.devices())
        assert dp * tp <= len(devices), \
            f"data_parallel_size({dp}) x tensor_parallel_size({tp}) needs " \
            f"{dp * tp} devices, have {len(devices)}"
        self.engines = [
            LLMEngine(model,
                      mesh=make_mesh(1, tp, devices=devices[i * tp:(i + 1) * tp]),
                      data_parallel_size=1, **kwargs)
            for i in range(dp)]
        self.config = self.engines[0].config
        self.tokenizer = self.engines[0].tokenizer

    def exit(self):
        for e in self.engines:
            e.exit()

    @property
    def metrics(self):
        agg: dict = {}
        for e in self.engines:
            for k, v in e.metrics.items():
                agg[k] = agg.get(k, 0) + v
        return agg

    def generate(self, prompts, sampling_params, use_tqdm: bool = True) -> list[dict]:
        """Round-robin the prompts across replicas and interleave their step
        loops; returns outputs ordered like the input prompts."""
        n = len(self.engines)
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        idx_by_engine: list[list[int]] = [[] for _ in range(n)]
        for i, (prompt, sp) in enumerate(zip(prompts, sampling_params)):
            self.engines[i % n].add_request(prompt, sp)
            idx_by_engine[i % n].append(i)
        if use_tqdm:
            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)
        per_engine: list[dict] = [{} for _ in range(n)]
        while True:
            done = True
            for k, e in enumerate(self.engines):
                if e.is_finished():
                    continue
                done = False
                out, _ = e.step()
                for seq_id, token_ids in out:
                    per_engine[k][seq_id] = token_ids
                    if use_tqdm:
                        pbar.update(1)
            if done:
                break
        results: list = [None] * len(prompts)
        decode = (self.tokenizer.decode if self.tokenizer is not None
                  else lambda ids: "")
        for k in range(n):
            # seq ids are globally increasing, so sorted order == submission
            # order == idx_by_engine[k] order
            for j, seq_id in enumerate(sorted(per_engine[k])):
                token_ids = per_engine[k][seq_id]
                results[idx_by_engine[k][j]] = {
                    "text": decode(token_ids), "token_ids": token_ids}
        if use_tqdm:
            pbar.close()
        return results
