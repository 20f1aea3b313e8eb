"""SPMD tensor-parallel sharding over a JAX device mesh.

This replaces the reference's entire TP machinery — the 5-class parallel-linear
hierarchy, NCCL process groups, and per-rank worker processes (reference:
nanovllm/layers/linear.py:12-153, embed_head.py:9-66, model_runner.py:26-115)
— with sharding *metadata*: every param leaf gets a ``NamedSharding`` over a
``("data", "model")`` mesh and XLA's SPMD partitioner inserts the collectives
(the psum after row-parallel o/down projections, the vocab-parallel logits
gather, ...). The same model code runs 1-chip, 1-host, and multi-host.

Sharding layout (matching the reference's TP math, linear.py:54-153):
- qkv_proj / gate_up_proj: column-parallel → shard the out dim ("model")
- o_proj / down_proj:      row-parallel    → shard the in dim ("model")
- embed_tokens / lm_head:  vocab-parallel  → shard the vocab dim
- KV caches:               shard the kv_heads dim
- norms / scales:          follow their weight's sharded dim (quantized layers
  shard too — the reference asserts tp_size==1 for quant, we remove that)
"""

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global(x, sharding: NamedSharding):
    """``device_put`` that also works when the sharding spans devices this
    process cannot address (multi-host): every process passes the same full
    host array and contributes only its addressable shards
    (``jax.make_array_from_callback``). Single-host meshes take the plain
    ``device_put`` fast path."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def make_mesh(data: int = 1, model: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if model is None:
        model = len(devices) // data
    arr = np.asarray(devices)[: data * model].reshape(data, model)
    return Mesh(arr, ("data", "model"))


# Param-tree path (joined with /) → PartitionSpec for the *weight* leaves.
# Leading L (stacked layers) axis is never sharded. Weights are [L, in, out].
_LAYER_RULES = [
    (r"qkv_proj", {"w": P(None, None, "model"), "w_q": P(None, None, "model"),
                   "b": P(None, "model"), "scale": "out", "zero": "out"}),
    (r"gate_up_proj", {"w": P(None, None, "model"), "w_q": P(None, None, "model"),
                       "b": P(None, "model"), "scale": "out", "zero": "out"}),
    (r"o_proj", {"w": P(None, "model", None), "w_q": P(None, "model", None),
                 "b": P(), "scale": "in", "zero": "in"}),
    (r"down_proj", {"w": P(None, "model", None), "w_q": P(None, "model", None),
                    "b": P(), "scale": "in", "zero": "in"}),
]


def _scale_spec(kind: str, scale_ndim: int, which: str) -> P:
    """PartitionSpec for a quant scale given the weight's sharded dim.

    scale shapes (per weight [L, K, N]): per_tensor → [L] or [L,1,1];
    per_row → [L, N]; per_group → [L, K/g, N].
    """
    if scale_ndim <= 1:
        return P()
    if which == "out":  # weight sharded on N
        if scale_ndim == 2:   # [L, N]
            return P(None, "model")
        return P(None, None, "model")  # [L, K/g, N]
    # weight sharded on K
    if scale_ndim == 2:       # [L, N] per-row scales don't touch K
        return P()
    return P(None, "model", None)     # [L, K/g, N]


class ShardingPlan:
    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def spec_for(self, path: str, leaf) -> P:
        if "layers" in path:
            for pat, rules in _LAYER_RULES:
                if re.search(pat, path):
                    leaf_name = path.rsplit("/", 1)[-1]
                    if leaf_name in ("w", "w_q", "b"):
                        return rules[leaf_name]
                    if leaf_name in ("scale", "zero"):
                        return _scale_spec(leaf_name, leaf.ndim, rules["scale"])
            return P()  # norms etc: replicated
        if path in ("embed_tokens", "lm_head"):
            return P("model", None)  # vocab-parallel
        return P()

    def shard_params(self, params):
        paths_params = _flatten_with_paths(params)
        out = {}
        for path, leaf in paths_params:
            spec = self.spec_for(path, leaf)
            out[path] = put_global(leaf, NamedSharding(self.mesh, spec))
        return _unflatten(out)

    def kv_sharding(self) -> NamedSharding:
        # pooled pages [L*P, page_size, {2Hk | Hk}, D]: shard the head axis.
        # Every pool interleaves K/V per head since round 5 — dense and
        # int8_rs as [K0 V0 K1 V1 ...] combined rows (pairs stay together
        # while tp <= Hk), int4 as one packed byte-plane per head — so the
        # same head-axis shard is valid for all of them.
        return NamedSharding(self.mesh, P(None, None, "model", None))

    def kv_scales_sharding(self) -> NamedSharding:
        # log-scale sidecar [L*P, page_size, 128] int8: the row packs all
        # 2Hk head scales into its first lanes (the 128-lane row is the HBM
        # physical minimum), so head-sharding the padded lane dim would
        # misalign; replicate — the sidecar is ~11% of int4 page bytes
        return NamedSharding(self.mesh, P(None, None, None))


def _flatten_with_paths(tree, prefix=""):
    if not isinstance(tree, dict):
        return [(prefix, tree)]
    items = []
    for k, v in tree.items():
        sub = f"{prefix}/{k}" if prefix else k
        items.extend(_flatten_with_paths(v, sub))
    return items


def _unflatten(flat: dict):
    out = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = leaf
    return out
