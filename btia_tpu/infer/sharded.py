"""Multi-chip sharded serving [B:5 "≥5k pairs/sec/chip on v5e-8", B:11].

Builds the jit'd serving program over a ('data', 'model') mesh:
  * image batch + question fan-out sharded over 'data' (DP);
  * ViT-L/BERT/BTIA/AD-head weights TP-sharded over 'model' via the
    regex rules in parallel/sharding.py — XLA inserts the per-layer
    all-reduces over ICI;
  * per-chip throughput is then the single-chip number × data-axis size
    (images never cross chips; only TP collectives do).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from btia_tpu.configs.config import Config
from btia_tpu.models.model import BTIAADNet
from btia_tpu.ops.fused_attn import fused_mesh
from btia_tpu.parallel.sharding import batch_sharding, param_shardings


def shard_serving_params(variables: dict, mesh: Mesh) -> dict:
    """Place params with TP sharding (model axis) and replicate stats."""
    model_parallel = mesh.shape["model"] > 1
    out = {}
    for coll, tree in variables.items():
        sh = param_shardings(tree, mesh, model_parallel and coll == "params")
        out[coll] = jax.tree.map(jax.device_put, tree, sh)
    return out


def _topk_real_answers(logits, k: int, vocab_limit: Optional[int]):
    """top_k over REAL answers — ops/answers.py rule (no <unk>, no padding
    past the built vocab)."""
    from btia_tpu.ops.answers import topk_real

    return topk_real(logits, k, vocab_limit)


def _require_vocab_limit(topk: int, vocab_limit: Optional[int]) -> None:
    # The static head is padded past the built vocab; top-k without a
    # vocab_limit could surface padding slots as "answers", violating the
    # ops/answers.py rule every other logits→answers surface follows.
    if topk and not vocab_limit:
        raise ValueError(
            "topk>0 requires vocab_limit=len(answer_vocab) so static-head "
            "padding slots are excluded from the returned answer ids"
        )


def make_sharded_serve_fn(
    model: BTIAADNet,
    mesh: Mesh,
    topk: int = 0,
    vocab_limit: Optional[int] = None,
) -> Callable:
    """Returns serve(variables, images (B,H,W,3) u8, qids (B,Q,L)) jit'd
    over the mesh. B must divide the 'data' axis. topk>0 → (vals, idxs)
    over real answers only; vocab_limit = len(answer_vocab) is REQUIRED
    then, so the static head's padding slots are masked too."""
    _require_vocab_limit(topk, vocab_limit)
    b_sh = batch_sharding(mesh)

    def serve(variables, images, qids):
        # fused_mesh(mesh): the fused Pallas projection kernels trace
        # inside explicit shard_map partitioning (batch over 'data',
        # heads over 'model') — the bare-pjit custom-call hazard
        # (operand replication/gather) is structurally impossible.
        with fused_mesh(mesh):
            images = jax.lax.with_sharding_constraint(images, b_sh)
            qids = jax.lax.with_sharding_constraint(qids, b_sh)
            img_tokens = model.apply(variables, images, method="encode_image")
            logits = model.apply(
                variables, img_tokens, qids, method="answer_questions"
            )
            if topk:
                return _topk_real_answers(logits, topk, vocab_limit)
            return logits

    return jax.jit(serve)


def make_sharded_serve_indexed_fn(
    model: BTIAADNet,
    mesh: Mesh,
    topk: int = 0,
    vocab_limit: Optional[int] = None,
) -> Callable:
    """Unique-question-dedup variant of `make_sharded_serve_fn`:
    serve(variables, images (B,·), unique_ids (U,S), qmap (B,Q)).

    The unique-question rows shard over 'data' (each chip encodes U/dp of
    the question tower), then the per-pair gather pulls from the sharded
    features — XLA inserts the all-gather over ICI (txt features are
    ~U·S·D·2 bytes, a few MB at serving sizes, so the collective is
    cheap next to the 32× tower saving). B and U must divide the data
    axis. topk>0 requires vocab_limit (see make_sharded_serve_fn)."""
    _require_vocab_limit(topk, vocab_limit)
    b_sh = batch_sharding(mesh)

    def serve(variables, images, unique_ids, qmap):
        with fused_mesh(mesh):  # see make_sharded_serve_fn
            images = jax.lax.with_sharding_constraint(images, b_sh)
            unique_ids = jax.lax.with_sharding_constraint(unique_ids, b_sh)
            qmap = jax.lax.with_sharding_constraint(qmap, b_sh)
            img_tokens = model.apply(variables, images, method="encode_image")
            logits = model.apply(
                variables,
                img_tokens,
                unique_ids,
                qmap,
                method="answer_questions_indexed",
            )
            if topk:
                return _topk_real_answers(logits, topk, vocab_limit)
            return logits

    return jax.jit(serve)
