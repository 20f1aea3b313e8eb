"""Engine loop: request intake → schedule → dispatch → (lagged) materialize.

Capability parity with the reference LLMEngine (reference:
nanovllm/engine/llm_engine.py:15-93). No worker processes to spawn or tear
down — one JAX process drives the whole local mesh — so ``exit`` is trivial
and there is no atexit choreography.

Async pipeline: each ``step`` dispatches one device call (a ragged prefill or
a K-step decode scan) and only *later* materializes its sampled tokens —
up to ``async_lag`` calls ride the device queue while the host schedules
ahead, so the device-transfer round trip (≈40 ms on a tunneled TPU, ≈µs on
PCIe) never serializes the token loop. EOS detection and prefix-cache hash
commits happen at materialization, lagging by at most
``async_lag * decode_steps_per_call`` tokens of (discarded) speculative work.

Multi-host lockstep (``jax.process_count() > 1``): every process runs the
same script; process 0 is the controller (scheduler + materialization) and
broadcasts each step's packed plan over a ``PlanChannel`` before dispatching;
workers replay the identical jit calls so all hosts enter every collective in
lockstep. Sampling is SPMD-deterministic (the PRNG key derives from the
broadcast step counter), so no token gather is needed — the replacement for
the reference's SharedMemory RPC control plane (reference:
nanovllm/engine/model_runner.py:67-115, per SURVEY.md §5.8).
"""

import os
import pickle
import time
from collections import deque
from dataclasses import fields

import numpy as np
from tqdm.auto import tqdm

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import NeedDrain, Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams


class LLMEngine:
    def __init__(self, model, **kwargs):
        config_kwargs = {f.name: v for f in fields(Config) for k, v in kwargs.items() if f.name == k}
        config = Config(model, **config_kwargs)
        self.config = config
        mesh = kwargs.get("mesh")
        self.channel = None
        self.is_controller = True
        import jax
        if config.data_parallel_size > 1:
            # DP is request-level parallelism over engine *replicas*
            # (engine/dp_engine.py) — construct via LLM(...), which routes
            # there (DataParallelEngine single-process, MultiHostDPEngine
            # across processes); a single lock-stepped engine cannot shard
            # its batch.
            raise ValueError(
                "data_parallel_size > 1 is handled by the DP engines; "
                "construct via nanovllm_tpu.LLM")
        # a process-local mesh (every device addressable) needs no lockstep
        # control plane even inside a multi-process job — that is how
        # MultiHostDPEngine runs one independent replica per host
        local_mesh = mesh is not None and all(
            d.process_index == jax.process_index()
            for d in mesh.devices.flat)
        if jax.process_count() > 1 and not local_mesh:
            from nanovllm_tpu.parallel import distributed as dist
            self.is_controller = jax.process_index() == 0
            self.channel = dist.PlanChannel(self.is_controller)
            if mesh is None:
                mesh = dist.make_multihost_mesh(1, config.tensor_parallel_size)
        elif mesh is None and config.tensor_parallel_size > 1:
            from nanovllm_tpu.parallel.sharding import make_mesh
            mesh = make_mesh(1, config.tensor_parallel_size)
        self.model_runner = ModelRunner(config, mesh=mesh)
        self.model_runner.warmup_jit()
        if self.channel is not None:
            self._verify_lockstep()
        self.tokenizer = _load_tokenizer(config.model)
        if self.tokenizer is not None and config.eos == -1:
            config.eos = self.tokenizer.eos_token_id
        self.scheduler = Scheduler(config)
        # in-flight device calls: (seqs, steps, device_tokens, is_prefill)
        self.pending: deque = deque()
        self._finished: list[tuple[int, list[int]]] = []
        # step-level observability (the reference's only signal is a tqdm
        # postfix, reference: llm_engine.py:76-84)
        self.metrics = {"prefill_tokens": 0, "decode_tokens": 0,
                        "prefill_calls": 0, "decode_calls": 0,
                        "decode_scan_steps": 0, "piggyback_tokens": 0,
                        "preemptions": 0, "requests_finished": 0,
                        "decode_tokens_used": 0}

    def _verify_lockstep(self):
        """Init-time handshake: every process must have derived identical
        shapes (KV pages, pack layout) or the lockstep jits would diverge."""
        from nanovllm_tpu.parallel.distributed import PLAN_SYNC
        fp = (self.config.num_kvcache_blocks, self.model_runner.pages_per_layer,
              *self.model_runner.pack_layout)
        if self.is_controller:
            self.channel.send(PLAN_SYNC, payload=pickle.dumps(fp))
        else:
            kind, _, payload = self.channel.recv()
            assert kind == PLAN_SYNC
            theirs = pickle.loads(payload)
            assert theirs == fp, f"lockstep config mismatch: {theirs} != {fp}"

    def add_request(self, prompt, sampling_params: SamplingParams = SamplingParams()):
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompts require a tokenizer"
            prompt = self.tokenizer.encode(prompt)
        seq = Sequence(prompt, sampling_params, block_size=self.config.kvcache_block_size)
        self.scheduler.add(seq)

    # ------------------------------------------------------------- pipeline
    def _materialize_one(self):
        """Block on the oldest in-flight call and postprocess its tokens."""
        seqs, steps, tokens, is_prefill = self.pending.popleft()
        mat = np.asarray(tokens)
        if mat.ndim == 1:  # prefill: [B] -> [1, B]
            mat = mat[None, :]
        for seq in self.scheduler.postprocess(seqs, steps, mat):
            self._finished.append((seq.seq_id, seq.completion_token_ids))
            self.metrics["requests_finished"] += 1

    def _dispatch(self, seqs, is_prefill: bool, steps, num_steps: int,
                  n_prefill: int | None = None):
        """Prepare one device call's packed plan, broadcast it to worker
        processes (multi-host lockstep), and dispatch locally."""
        mr = self.model_runner
        use_topkp = mr._needs_topkp(seqs)
        if is_prefill:
            buf, fbuf, bucket = mr.prepare(seqs, True, n_prefill=n_prefill)
        else:
            buf, fbuf, bucket = mr.prepare_decode(seqs, steps)
        if self.channel is not None:
            from nanovllm_tpu.parallel.distributed import PLAN_STEP
            self.channel.send(
                PLAN_STEP,
                ints=(int(is_prefill), bucket, num_steps, int(use_topkp),
                      buf.shape[0]),
                payload=buf.tobytes() + fbuf.tobytes())
        return mr.dispatch(is_prefill, bucket, num_steps, use_topkp, buf, fbuf)

    def run_worker_step(self) -> bool:
        """Worker-process side of the lockstep protocol: receive one plan and
        replay it. Returns False when the controller signals end-of-generate
        (payload = the pickled outputs, stored on ``self._worker_outputs``)."""
        from nanovllm_tpu.parallel.distributed import PLAN_DONE, PLAN_STEP
        kind, ints, payload = self.channel.recv()
        if kind == PLAN_STEP:
            is_prefill, bucket, num_steps, use_topkp, nbuf = ints[:5]
            buf = np.frombuffer(payload[:4 * nbuf], np.int32)
            fbuf = np.frombuffer(payload[4 * nbuf:], np.float32)
            self.model_runner.dispatch(bool(is_prefill), bucket, num_steps,
                                       bool(use_topkp), buf, fbuf)
            return True
        assert kind == PLAN_DONE
        self._worker_outputs = pickle.loads(payload)
        return False

    def _pick_decode_steps(self) -> int:
        """Adaptive K: the largest of {K, K/2, K/4} whose expected
        speculative-waste fraction h*(lag+0.5)*K stays under the target,
        where h is the observed unplannable-finish hazard per token. An
        ignore_eos workload has h = 0 and always runs full K."""
        cfg = self.config
        k_max = cfg.decode_steps_per_call
        if not cfg.adaptive_decode_steps:
            return k_max
        sch = self.scheduler
        h = sch.unplanned_finishes / max(sch.tokens_appended, 1)
        if h <= 0.0:
            return k_max
        per_step = h * (cfg.async_lag + 0.5)
        for k in (k_max, max(k_max // 2, 1), max(k_max // 4, 1)):
            if per_step * k <= cfg.decode_waste_target:
                return k
        return max(k_max // 4, 1)

    def step(self):
        """One scheduling + dispatch step (reference: llm_engine.py:48-54).
        Returns (finished outputs, num_tokens) where num_tokens > 0 counts
        prefill tokens and < 0 counts scheduled decode tokens."""
        num_tokens = 0
        k_call = self._pick_decode_steps()
        self.scheduler.decode_steps = k_call
        while True:
            try:
                seqs, is_prefill, steps = self.scheduler.schedule(
                    can_drain=bool(self.pending))
                break
            except NeedDrain:
                # materialize the *oldest* in-flight call only — finished
                # sequences may free blocks; retry scheduling right away
                # instead of stalling until the whole pipeline drains
                self._materialize_one()
        if seqs:
            if is_prefill:
                # lanes past n_prefill are piggybacked single-step decodes
                # (mixed batch); their input token is device-resident
                n_prefill = self.scheduler.last_n_prefill
                tokens = self._dispatch(seqs, True, steps, 1,
                                        n_prefill=n_prefill)
                num_tokens = sum(len(s) - s.num_cached_tokens
                                 for s in seqs[:n_prefill])
                for s in seqs[:n_prefill]:
                    s.num_sched_tokens = s.num_tokens + 1
                for s in seqs[n_prefill:]:
                    s.num_sched_tokens += 1
                self.metrics["prefill_tokens"] += num_tokens
                self.metrics["prefill_calls"] += 1
                self.metrics["decode_tokens"] += len(seqs) - n_prefill
                self.metrics["piggyback_tokens"] += len(seqs) - n_prefill
            else:
                tokens = self._dispatch(seqs, False, steps, k_call)
                num_tokens = -sum(steps)
                for s, k in zip(seqs, steps):
                    s.num_sched_tokens += k
                self.metrics["decode_tokens"] += sum(steps)
                self.metrics["decode_calls"] += 1
                # actual scan depth of this call (adaptive-K may run K/2 or
                # K/4): the denominator for true avg-lane-occupancy diagnostics
                self.metrics["decode_scan_steps"] += k_call
            for s in seqs:
                s.inflight += 1
            try:  # start the D2H transfer in the background
                tokens.copy_to_host_async()
            except Exception:
                pass
            self.pending.append((seqs, steps, tokens, is_prefill))
            while len(self.pending) > self.config.async_lag:
                self._materialize_one()
        elif self.pending:
            self._materialize_one()
        self.metrics["preemptions"] = self.scheduler.num_preemptions
        self.metrics["decode_tokens_used"] = self.scheduler.tokens_appended
        self.metrics["decode_tokens_wasted"] = self.scheduler.decode_tokens_wasted
        self.metrics["unplanned_finishes"] = self.scheduler.unplanned_finishes
        out, self._finished = self._finished, []
        return out, num_tokens

    def is_finished(self):
        return self.scheduler.is_finished() and not self.pending

    def exit(self):
        pass

    def generate(self, prompts, sampling_params, use_tqdm: bool = True) -> list[dict]:
        """Batch generation (reference: llm_engine.py:59-93): returns
        [{"text", "token_ids"}] ordered like the input prompts.

        Set ``NANOVLLM_TPU_PROFILE=<dir>`` to capture a jax.profiler trace of
        the whole batch (viewable in XProf/TensorBoard)."""
        profile_dir = os.environ.get("NANOVLLM_TPU_PROFILE")
        if profile_dir:
            import jax
            jax.profiler.start_trace(profile_dir)
        try:
            return self._generate(prompts, sampling_params, use_tqdm)
        finally:
            if profile_dir:
                import jax
                jax.profiler.stop_trace()

    def _generate(self, prompts, sampling_params, use_tqdm: bool) -> list[dict]:
        if self.channel is not None and not self.is_controller:
            # SPMD-style call: workers replay broadcast plans until the
            # controller's matching generate() finishes, then return the
            # same outputs (broadcast with the DONE plan).
            while self.run_worker_step():
                pass
            return self._worker_outputs
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
                elif num_tokens < 0:
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
        if self.channel is not None:
            from nanovllm_tpu.parallel.distributed import PLAN_DONE
            self.channel.send(PLAN_DONE, payload=pickle.dumps(outputs))
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
