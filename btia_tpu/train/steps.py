"""jit-compiled train/eval steps, pjit-sharded over the device mesh.

The reference's hot loop [SURVEY §3.1] becomes ONE compiled XLA program per
step: on-device ingest → encoders → BTIA (fused Pallas) → head → CE loss →
backward → optax update. DP gradients all-reduce via the psum XLA inserts
from the NamedSharding annotations — the TPU-native 'distributed backend'
[SURVEY §5.8]. TP (ViT-L) activates via model_parallel param rules.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from btia_tpu.configs.config import Config
from btia_tpu.models.model import BTIAADNet
from btia_tpu.ops.answers import argmax_real
from btia_tpu.parallel.sharding import batch_sharding, param_shardings, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    t = cfg.train
    total = max(steps_per_epoch * t.epochs, t.warmup_steps + 1)

    def schedule(peak: float):
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=peak,
            warmup_steps=t.warmup_steps,
            decay_steps=total,
            end_value=peak * 0.01,
        )

    clip = optax.clip_by_global_norm(t.grad_clip)
    if t.encoder_lr_scale == 1.0:
        return optax.chain(clip, optax.adamw(schedule(t.lr), weight_decay=t.weight_decay))

    # Pretrained encoders fine-tune at a lower LR than the randomly
    # initialized fusion/head [SURVEY §2.3 harness conventions].
    def labels(params):
        return {
            k: jax.tree.map(
                lambda _: "encoder"
                if k in ("image_encoder", "question_encoder")
                else "rest",
                v,
            )
            for k, v in params.items()
        }

    return optax.chain(
        clip,
        optax.multi_transform(
            {
                "encoder": optax.adamw(
                    schedule(t.lr * t.encoder_lr_scale), weight_decay=t.weight_decay
                ),
                "rest": optax.adamw(schedule(t.lr), weight_decay=t.weight_decay),
            },
            labels,
        ),
    )


def create_state(
    model: BTIAADNet,
    cfg: Config,
    mesh: Mesh,
    steps_per_epoch: int = 100,
    seed: Optional[int] = None,
) -> TrainState:
    """Init params on device with their target shardings (no host blowup)."""
    m = cfg.model
    rng = jax.random.PRNGKey(cfg.train.seed if seed is None else seed)
    ingest = max(256, m.image_size)
    imgs = jnp.zeros((2, ingest, ingest, 3), jnp.uint8)
    qids = jnp.zeros((2, m.max_question_len), jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, imgs, qids, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    model_parallel = mesh.shape["model"] > 1
    p_sh = param_shardings(params, mesh, model_parallel)
    params = jax.tree.map(jax.device_put, params, p_sh)
    batch_stats = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh)), batch_stats
    )
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=rng,
        tx=tx,
    )


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    valid: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
) -> jax.Array:
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
    losses = -jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    if valid is not None:
        w = valid.astype(losses.dtype)
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(losses)


def _train_step_body(
    model: BTIAADNet, cfg: Config, mesh: Mesh
) -> Callable[[TrainState, dict], Tuple[TrainState, dict]]:
    b_sh = batch_sharding(mesh)
    ls = cfg.train.label_smoothing

    def step(state: TrainState, batch: dict) -> Tuple[TrainState, dict]:
        from btia_tpu.ops.fused_attn import fused_mesh

        # Multi-device programs trace with fused_mesh(mesh): the fused
        # projection kernels run inside an explicit shard_map (batch over
        # 'data', heads over 'model') — never under bare-pjit custom-call
        # partitioning, which would replicate/gather operands.
        with fused_mesh(mesh):
            return _step_inner(state, batch)

    def _step_inner(state: TrainState, batch: dict) -> Tuple[TrainState, dict]:
        images = jax.lax.with_sharding_constraint(batch["images"], b_sh)
        qids = jax.lax.with_sharding_constraint(batch["question_ids"], b_sh)
        labels = jax.lax.with_sharding_constraint(batch["answer_ids"], b_sh)
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            # mutable must be False (not []) when there are no batch_stats:
            # flax returns an (out, state) tuple for ANY non-False mutable,
            # including the empty list.
            mutable: object = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables,
                images,
                qids,
                train=True,
                rngs={"dropout": rng},
                mutable=mutable,
            )
            logits, new_state = out if mutable else (out, {})
            loss = cross_entropy(logits, labels, label_smoothing=ls)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, (new_state, acc)

        (loss, (new_model_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt,
        )
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "accuracy": acc, "grad_norm": gnorm}

    return step


def make_train_step(
    model: BTIAADNet, cfg: Config, mesh: Mesh
) -> Callable[[TrainState, dict], Tuple[TrainState, dict]]:
    step = _train_step_body(model, cfg, mesh)
    donate = (0,) if cfg.train.donate else ()
    return jax.jit(step, donate_argnums=donate)


def make_train_step_scan(
    model: BTIAADNet, cfg: Config, mesh: Mesh
) -> Callable[[TrainState, dict], Tuple[TrainState, dict]]:
    """K optimizer steps in ONE compiled program via lax.scan [VERDICT r1
    item 8]: TrainState never leaves the device between the K steps —
    one launch and one (stacked, K-element) metrics return per chunk
    instead of ~1300 state buffers per step.

    The chunk dict carries (K, B, ...) arrays; semantics are bit-identical
    to K sequential make_train_step calls (same fold_in(step) RNG chain).
    """
    step = _train_step_body(model, cfg, mesh)

    def multi(state: TrainState, chunk: dict) -> Tuple[TrainState, dict]:
        return jax.lax.scan(step, state, chunk)

    donate = (0,) if cfg.train.donate else ()
    return jax.jit(multi, donate_argnums=donate)


def make_eval_step(
    model: BTIAADNet, cfg: Config, mesh: Mesh, vocab_size: int = 0
) -> Callable:
    b_sh = batch_sharding(mesh)
    limit = vocab_size or cfg.model.answer_vocab_size

    def step(state: TrainState, batch: dict) -> dict:
        images = jax.lax.with_sharding_constraint(batch["images"], b_sh)
        qids = jax.lax.with_sharding_constraint(batch["question_ids"], b_sh)
        logits = model.apply(state.variables(), images, qids, train=False)
        # The head is statically sized to the config vocab; only the first
        # len(answer_vocab) entries denote real answers. Index 0 is
        # <unk>/out-of-vocab and never a real answer (vocab.py AnswerVocab),
        # so it is excluded from the argmax, and ground-truth answers that
        # encoded to 0 (OOV references) are scored incorrect — otherwise a
        # model predicting <unk> on an OOV reference counts as a match and
        # inflates open-ended accuracy.
        preds = argmax_real(logits, limit)
        answerable = batch["answer_ids"] != 0
        correct = (preds == batch["answer_ids"]) & answerable & batch["valid"]
        return {"preds": preds, "correct": correct}

    return jax.jit(step)
