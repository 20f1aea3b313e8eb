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


class MultiHostDPEngine:
    """Data parallelism across hosts: ``data_parallel_size`` replicas spread
    over ``jax.process_count()`` processes, each replica living entirely on
    one host's local devices (TP inside the replica rides ICI; NO per-step
    cross-host traffic — the round-3 lockstep TP path is for models that
    must span hosts, this is for fleets of host-sized replicas).

    Every process calls ``generate`` SPMD-style with the full prompt list;
    requests partition round-robin by global replica index, each process
    serves its own replicas' share with a plain local engine (or a local
    DataParallelEngine when it hosts several replicas), and the per-process
    outputs are exchanged with two ``process_allgather`` collectives so
    every process returns the identical, input-ordered result list."""

    def __init__(self, model, **kwargs):
        import jax

        from nanovllm_tpu.engine.llm_engine import LLMEngine
        from nanovllm_tpu.parallel.sharding import make_mesh

        self.num_procs = jax.process_count()
        self.pid = jax.process_index()
        dp = kwargs.pop("data_parallel_size")
        tp = kwargs.get("tensor_parallel_size", 1)
        kwargs.pop("mesh", None)
        assert dp % self.num_procs == 0, \
            f"data_parallel_size({dp}) must divide evenly over " \
            f"{self.num_procs} processes"
        self.replicas_per_proc = k = dp // self.num_procs
        self.dp = dp
        local = jax.local_devices()
        assert k * tp <= len(local), \
            f"{k} local replicas x tp={tp} need {k * tp} local devices, " \
            f"have {len(local)}"
        if k == 1:
            self.local = LLMEngine(
                model, mesh=make_mesh(1, tp, devices=local[:tp]),
                data_parallel_size=1, **kwargs)
        else:
            self.local = DataParallelEngine(
                model, mesh=make_mesh(1, k * tp, devices=local[:k * tp]),
                data_parallel_size=k, **kwargs)
        self.config = self.local.config
        self.tokenizer = self.local.tokenizer

    def exit(self):
        self.local.exit()

    @property
    def metrics(self):
        return self.local.metrics

    @staticmethod
    def _allgather_bytes(blob: bytes) -> list[bytes]:
        """Exchange one byte blob per process (ragged): length allgather
        fixes the padded shape, then one data allgather."""
        import numpy as np
        from jax.experimental import multihost_utils
        lens = multihost_utils.process_allgather(
            np.array([len(blob)], np.int64))
        cap = int(np.max(lens))
        buf = np.zeros(cap, np.uint8)
        buf[:len(blob)] = np.frombuffer(blob, np.uint8)
        data = np.asarray(multihost_utils.process_allgather(buf))
        return [data[p, :int(lens[p])].tobytes()
                for p in range(data.shape[0])]

    def generate(self, prompts, sampling_params, use_tqdm: bool = True) -> list[dict]:
        import pickle

        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        k = self.replicas_per_proc
        # request i -> replica (i % dp) -> process (i % dp) // k
        mine = [i for i in range(len(prompts))
                if (i % self.dp) // k == self.pid]
        outs = self.local.generate(
            [prompts[i] for i in mine], [sampling_params[i] for i in mine],
            use_tqdm=use_tqdm and self.pid == 0)
        # local engines return outputs in submission order == ``mine`` order
        blobs = self._allgather_bytes(pickle.dumps((mine, outs)))
        results: list = [None] * len(prompts)
        for blob in blobs:
            idxs, theirs = pickle.loads(blob)
            for i, o in zip(idxs, theirs):
                results[i] = o
        assert all(r is not None for r in results)
        return results
