"""Training/eval harness — the L4 layer [SURVEY §1.1, §3.1, §3.2].

Epoch loop over the prefetching host pipeline, one jit'd program per step,
per-epoch evaluation with the reference metric definitions, best-on-val
checkpointing, and resume-from-latest.
"""

from __future__ import annotations

import itertools
import signal
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

from btia_tpu.configs.config import Config
from btia_tpu.data.builder import DataModule, build_data
from btia_tpu.data.pipeline import Batch
from btia_tpu.models.model import BTIAADNet, build_model
from btia_tpu.parallel.mesh import MeshConfig, make_mesh
from btia_tpu.parallel.sharding import shard_batch, shard_chunk
from btia_tpu.train.checkpoint import Checkpointer
from btia_tpu.train.metrics import EvalAccumulator
from btia_tpu.train.steps import (
    TrainState,
    create_state,
    make_eval_step,
    make_train_step,
    make_train_step_scan,
)
from btia_tpu.utils.logging import MetricLogger


def batch_to_device(batch: Batch, mesh) -> dict:
    arrays = {
        "images": batch.images,
        "question_ids": batch.question_ids,
        "answer_ids": batch.answer_ids,
        "valid": batch.valid,
    }
    return shard_batch(arrays, mesh)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        workdir: str | Path = "runs/default",
        data: Optional[DataModule] = None,
    ):
        self.cfg = cfg
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.data = data or build_data(cfg)
        self.model: BTIAADNet = build_model(cfg.model)
        self.mesh = make_mesh(MeshConfig(cfg.mesh.data, cfg.mesh.model))
        self.state: TrainState = create_state(
            self.model, cfg, self.mesh, steps_per_epoch=self.data.steps("train")
        )
        self.train_step = make_train_step(self.model, cfg, self.mesh)
        # K steps per launch [VERDICT r1 item 8]: the scanned program keeps
        # TrainState device-resident across the chunk; the plain step
        # remains for tail chunks shorter than K.
        self.train_step_scan = (
            make_train_step_scan(self.model, cfg, self.mesh)
            if cfg.train.steps_per_call > 1
            else None
        )
        self.eval_step = make_eval_step(
            self.model, cfg, self.mesh, vocab_size=len(self.data.answer_vocab)
        )
        self.ckpt = Checkpointer(
            self.workdir / cfg.train.checkpoint_dir, cfg.train.keep_checkpoints
        )
        self.ckpt.save_config(cfg)
        self.data.save_vocabs(self.workdir / "vocabs")
        self.logger = MetricLogger(self.workdir / "metrics.jsonl")
        self._preempted = False

    def install_preemption_handler(self) -> None:
        """SIGTERM-safe training [SURVEY §5.3]: on TPU maintenance events /
        preemption the process gets SIGTERM; we finish the in-flight step,
        checkpoint, and exit cleanly. Resume continues bit-identically
        (deterministic iterator + stored step, see fit())."""

        def handler(signum, frame):
            self._preempted = True

        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)

    def resume_if_available(self) -> bool:
        if self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            return True
        return False

    def fit(self, epochs: Optional[int] = None) -> List[Dict[str, float]]:
        cfg = self.cfg
        history: List[Dict[str, float]] = []
        epochs = epochs or cfg.train.epochs
        # Mid-epoch resume [SURVEY §5.3]: the iterator order is a pure
        # function of (seed, epoch), so (epoch, offset) derived from the
        # restored step reproduces the exact uninterrupted batch sequence.
        spe = max(self.data.steps("train"), 1)
        start_step = int(jax.device_get(self.state.step))
        start_epoch, start_offset = divmod(start_step, spe)
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses, accs, n_items = [], [], 0
            it = self.data.iterator("train", seed=cfg.train.seed + epoch)
            offset = start_offset if epoch == start_epoch else 0
            it = itertools.islice(it, offset, None)
            K = max(1, cfg.train.steps_per_call)
            i = offset - 1  # step index within the epoch
            while True:
                buf = list(itertools.islice(it, K))
                if not buf:
                    break
                if len(buf) == K and self.train_step_scan is not None:
                    # One launch for K steps; TrainState stays on device.
                    chunk = {
                        "images": np.stack([b.images for b in buf]),
                        "question_ids": np.stack([b.question_ids for b in buf]),
                        "answer_ids": np.stack([b.answer_ids for b in buf]),
                        "valid": np.stack([b.valid for b in buf]),
                    }
                    self.state, ms = self.train_step_scan(
                        self.state, shard_chunk(chunk, self.mesh)
                    )
                    m = jax.tree.map(lambda x: x[-1], ms)  # last step's metrics
                else:
                    for b in buf:
                        self.state, m = self.train_step(
                            self.state, batch_to_device(b, self.mesh)
                        )
                i += len(buf)
                n_items += sum(len(b) for b in buf)
                if self._preempted:
                    self.ckpt.save(self.state)
                    # Preemption exit is the one place the save MUST be
                    # durable before we return — the process is about to
                    # die. Steady-state saves stay async (SURVEY §5.3).
                    self.ckpt.wait_until_finished()
                    # state.step is the ground truth; `i` restarts at 0 after
                    # a mid-epoch resume while state.step does not.
                    self.logger.log(
                        split="preempt",
                        step=int(jax.device_get(self.state.step)),
                    )
                    return history
                first = i < offset + len(buf)
                if first or (i + 1) // cfg.train.log_every > (i + 1 - len(buf)) // cfg.train.log_every:
                    m = jax.device_get(m)
                    losses.append(float(m["loss"]))
                    accs.append(float(m["accuracy"]))
                    self.logger.log(
                        step=int(jax.device_get(self.state.step)),
                        split="train",
                        loss=float(m["loss"]),
                        accuracy=float(m["accuracy"]),
                        grad_norm=float(m["grad_norm"]),
                    )
            wall = time.time() - t0
            eval_metrics = self.evaluate("val")
            row = {
                "epoch": epoch,
                "train_loss": float(np.mean(losses)) if losses else float("nan"),
                "train_accuracy": float(np.mean(accs)) if accs else float("nan"),
                "examples_per_sec": n_items / max(wall, 1e-6),
                **{f"val_{k}": v for k, v in eval_metrics.items()},
            }
            history.append(row)
            self.logger.log(split="epoch", **row)
            # Async: the next epoch's steps overlap the checkpoint write.
            self.ckpt.save(self.state, metric=eval_metrics.get("accuracy"))
        self.ckpt.wait_until_finished()  # durable before fit() returns
        return history

    def evaluate(self, split: str = "test") -> Dict[str, float]:
        acc = EvalAccumulator()
        vocab = self.data.answer_vocab
        for batch in self.data.iterator(split):
            device_batch = batch_to_device(batch, self.mesh)
            out = jax.device_get(self.eval_step(self.state, device_batch))
            preds = out["preds"]
            acc.add_batch(
                correct=np.asarray(out["correct"]),
                valid=batch.valid,
                answer_types=batch.answer_types,
                categories=batch.categories,
                pred_answers=[vocab.decode(int(p)) for p in preds],
                ref_answers=[
                    vocab.decode(int(a)) for a in batch.answer_ids
                ],
            )
        return acc.summary()
