"""Rule-based parameter/batch shardings (pjit-style, no per-module plumbing).

Instead of annotating every Flax module with logical axes, we map parameter
*path names* to PartitionSpecs with regex rules. This keeps the model code
clean and makes the TP layout auditable in one place.

TP layout (Megatron-style column→row pairing, all-reduce once per block):
  - attention q/k/v kernels: shard output (head) dim over 'model'
  - attention out kernel:    shard input  (head) dim over 'model'
  - MLP fc1 kernel:          shard output (hidden) dim
  - MLP fc2 kernel:          shard input  (hidden) dim
Everything else (LayerNorms, embeddings, conv stacks, small heads) is
replicated — at these model sizes replication is free and avoids collectives.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from btia_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec per rank) — first match wins. Specs are keyed by the
# parameter's ndim so biases pair correctly with their kernels.
_TP_RULES: list[tuple[str, dict[int, P]]] = [
    # q/k/v/qkv projection kernels + biases: shard the head dim (last).
    (
        r"(q_proj|k_proj|v_proj|qkv)/(kernel|bias)$",
        {2: P(None, MODEL_AXIS), 1: P(MODEL_AXIS)},
    ),
    # attention output projection: shard the input (head) dim; bias replicated.
    (r"(o_proj|out_proj)/kernel$", {2: P(MODEL_AXIS, None)}),
    # transformer MLP: fc1 column-parallel, fc2 row-parallel.
    (r"fc1/(kernel|bias)$", {2: P(None, MODEL_AXIS), 1: P(MODEL_AXIS)}),
    (r"fc2/kernel$", {2: P(MODEL_AXIS, None)}),
]


def _spec_for(path: str, ndim: int, model_parallel: bool) -> P:
    if model_parallel:
        for pattern, by_rank in _TP_RULES:
            if re.search(pattern, path) and ndim in by_rank:
                return by_rank[ndim]
    return P()  # replicated


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(
    params: Any, mesh: Mesh, model_parallel: bool = False
) -> Any:
    """NamedSharding pytree matching ``params``."""

    def leaf(key_path, x):
        spec = _spec_for(_path_str(key_path), getattr(x, "ndim", 0), model_parallel)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'data'; model-dim replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device_put a host batch with the batch dim sharded over 'data'.

    Single-process: ``batch`` is the full global batch. Multi-process
    (a real multi-host slice, jax.process_count() > 1): ``batch`` is
    this process's LOCAL shard of the global batch — each host feeds
    only the rows its own devices will hold (global batch dim = sum of
    local shards, assembled without any cross-host transfer). The data
    pipeline selects per-host rows by ``jax.process_index()``.
    """
    if jax.process_count() > 1:
        return shard_batch_local(batch, mesh)
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_batch_local(local_batch: Any, mesh: Mesh) -> Any:
    """Per-process local batch shards → ONE global array sharded over
    'data' (multi-host training feed, SURVEY §2.5/§5.8: each host's rows
    land on its own devices; the gradient psum is the only cross-host
    traffic)."""
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, P(DATA_AXIS)
        ),
        local_batch,
    )


def shard_chunk(chunk: Any, mesh: Mesh) -> Any:
    """Device_put a stacked (K, B, ...) batch chunk for the scanned train
    step: scan (K) dim replicated, batch (B) dim sharded over 'data'."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), chunk)
