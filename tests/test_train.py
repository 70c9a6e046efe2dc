"""Integration tier [SURVEY §4.2]: overfit-a-batch, eval metrics,
checkpoint save/restore/resume."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btia_tpu.configs.config import Config, DataConfig
from btia_tpu.data.builder import build_data
from btia_tpu.data.synthetic import generate_synthetic_dataset
from btia_tpu.models.model import build_model
from btia_tpu.parallel.mesh import MeshConfig, make_mesh
from btia_tpu.train.metrics import EvalAccumulator, corpus_bleu
from btia_tpu.train.steps import create_state, cross_entropy, make_train_step
from btia_tpu.train.trainer import Trainer, batch_to_device


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    from btia_tpu.configs import get_config

    root = tmp_path_factory.mktemp("traindata")
    generate_synthetic_dataset(root)
    base = get_config("tiny_test")
    cfg = Config(
        name=base.name,
        model=base.model,
        data=DataConfig(dataset="vqa_rad", data_dir=str(root)),
        train=base.train,
        mesh=base.mesh,
    )
    return cfg, root


class TestLoss:
    def test_cross_entropy_matches_manual(self, rng):
        import jax.numpy as jnp

        logits = jnp.asarray(rng.randn(4, 7), jnp.float32)
        labels = jnp.asarray([0, 3, 6, 2])
        loss = cross_entropy(logits, labels)
        manual = -np.mean(
            [
                np.log(np.exp(l_) / np.exp(l_).sum())[y]
                for l_, y in zip(np.asarray(logits, np.float64), np.asarray(labels))
            ]
        )
        assert abs(float(loss) - manual) < 1e-5

    def test_valid_mask_excludes_rows(self, rng):
        import jax.numpy as jnp

        logits = jnp.asarray(rng.randn(4, 7), jnp.float32)
        labels = jnp.asarray([0, 3, 6, 2])
        valid = jnp.asarray([True, True, False, False])
        masked = cross_entropy(logits, labels, valid=valid)
        subset = cross_entropy(logits[:2], labels[:2])
        assert abs(float(masked) - float(subset)) < 1e-6


class TestOptimizer:
    def test_encoder_lr_scale_applied(self, tiny_cfg):
        """Encoder params get scaled-LR updates [encoder_lr_scale]."""
        import dataclasses

        import jax.numpy as jnp
        import optax

        from btia_tpu.train.steps import make_optimizer

        cfg = dataclasses.replace(
            tiny_cfg,
            train=dataclasses.replace(
                tiny_cfg.train, encoder_lr_scale=0.1, warmup_steps=0,
                grad_clip=1e9, weight_decay=0.0,
            ),
        )
        tx = make_optimizer(cfg, steps_per_epoch=10)
        params = {
            "image_encoder": {"w": jnp.ones((4,))},
            "question_encoder": {"w": jnp.ones((4,))},
            "head": {"w": jnp.ones((4,))},
        }
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        # step a few times so adam's moments stabilize to unit updates
        for _ in range(3):
            updates, state = tx.update(grads, state, params)
        enc = float(jnp.abs(updates["image_encoder"]["w"]).mean())
        head = float(jnp.abs(updates["head"]["w"]).mean())
        assert enc < head * 0.5, (enc, head)


class TestTrainStep:
    def test_overfit_single_batch(self, tiny_run):
        cfg, _ = tiny_run
        dm = build_data(cfg)
        model = build_model(cfg.model)
        mesh = make_mesh(MeshConfig(data=-1, model=1))
        state = create_state(model, cfg, mesh, steps_per_epoch=10)
        step = make_train_step(model, cfg, mesh)
        batch = next(iter(dm.iterator("train", batch_size=8)))
        device_batch = batch_to_device(batch, mesh)
        losses = []
        for _ in range(12):
            state, m = step(state, device_batch)
            losses.append(float(jax.device_get(m["loss"])))
        assert losses[-1] < losses[0] * 0.7, f"no overfit: {losses}"
        assert np.isfinite(losses).all()

    def test_train_step_without_batch_stats(self, tiny_run):
        """Models with no BatchNorm (ViT/BERT/LSTM) must train too: flax
        apply(mutable=[]) returns a tuple even for the EMPTY list, which
        used to crash the loss_fn (regression, round 2)."""
        import dataclasses

        cfg, _ = tiny_run
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, image_encoder="vit_test"),
        )
        dm = build_data(cfg)
        model = build_model(cfg.model)
        mesh = make_mesh(MeshConfig(data=-1, model=1))
        state = create_state(model, cfg, mesh, steps_per_epoch=10)
        assert not state.batch_stats
        step = make_train_step(model, cfg, mesh)
        batch = next(iter(dm.iterator("train", batch_size=8)))
        state, m = step(state, batch_to_device(batch, mesh))
        assert np.isfinite(float(jax.device_get(m["loss"])))


class TestEvalStep:
    def test_unk_excluded_from_argmax(self, tiny_cfg):
        """Index 0 (<unk>) is never a valid prediction, and OOV references
        (answer_ids==0) are scored incorrect — otherwise a model predicting
        <unk> on an OOV reference inflates accuracy (ADVICE medium)."""
        import jax.numpy as jnp

        from btia_tpu.train.steps import make_eval_step

        class FakeModel:
            def apply(self, variables, images, qids, train):
                # <unk> has the largest logit; best real answer is index 2.
                row = jnp.asarray([10.0, 1.0, 5.0, 0.0])
                return jnp.tile(row, (images.shape[0], 1))

        from flax import struct

        class FakeState(struct.PyTreeNode):
            def variables(self):
                return {}

        mesh = make_mesh(MeshConfig(data=-1, model=1))
        step = make_eval_step(FakeModel(), tiny_cfg, mesh, vocab_size=4)
        batch = {
            "images": np.zeros((2, 8, 8, 3), np.uint8),
            "question_ids": np.zeros((2, 4), np.int32),
            "answer_ids": np.asarray([0, 2], np.int32),
            "valid": np.asarray([True, True]),
        }
        out = jax.device_get(step(FakeState(), batch))
        assert out["preds"].tolist() == [2, 2]  # never 0
        assert out["correct"].tolist() == [False, True]


class TestTrainer:
    def test_fit_eval_checkpoint_resume(self, tiny_run, tmp_path):
        cfg, _ = tiny_run
        workdir = tmp_path / "run"
        trainer = Trainer(cfg, workdir)
        history = trainer.fit(epochs=1)
        assert len(history) == 1
        assert "val_accuracy" in history[0]
        metrics = trainer.evaluate("test")
        assert 0.0 <= metrics["accuracy"] <= 1.0
        assert "closed_accuracy" in metrics

        # checkpoint round-trip into a fresh trainer
        step_before = int(jax.device_get(trainer.state.step))
        trainer2 = Trainer(cfg, workdir)
        assert trainer2.resume_if_available()
        assert int(jax.device_get(trainer2.state.step)) == step_before
        p1 = jax.tree.leaves(trainer.state.params)[0]
        p2 = jax.tree.leaves(trainer2.state.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


class TestBestCheckpointRetention:
    def test_best_survives_rotation(self, tiny_run, tmp_path):
        """The rotating manager's max_to_keep must not delete the best
        checkpoint: a val curve peaking early (the normal overfitting
        shape) used to leave best.json pointing at a garbage-collected
        step and restore(best=True) raising (review finding, round 2)."""
        import dataclasses

        from btia_tpu.models.model import build_model
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh
        from btia_tpu.train.checkpoint import Checkpointer
        from btia_tpu.train.steps import create_state

        cfg, _ = tiny_run
        model = build_model(cfg.model)
        mesh = make_mesh(MeshConfig(-1, 1))
        state = create_state(model, cfg, mesh, steps_per_epoch=10)
        ckpt = Checkpointer(tmp_path / "ck", max_to_keep=2)
        # Metric peaks at the FIRST save; 3 more saves rotate it out of
        # the latest-2 window.
        for step, metric in [(1, 0.9), (2, 0.5), (3, 0.4), (4, 0.3)]:
            state = state.replace(step=jnp.asarray(step))
            ckpt.save(state, metric=metric)
        restored = ckpt.restore(state, best=True)
        assert int(jax.device_get(restored.step)) == 1
        latest = ckpt.restore(state)
        assert int(jax.device_get(latest.step)) == 4

    def test_legacy_best_json_fallback(self, tiny_run, tmp_path):
        """Pre-fix checkpoints have only best.json (no best_ckpt dir):
        restore(best=True) must still resolve through the rotating manager
        when the step survives."""
        import json as json_

        from btia_tpu.models.model import build_model
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh
        from btia_tpu.train.checkpoint import Checkpointer
        from btia_tpu.train.steps import create_state

        cfg, _ = tiny_run
        model = build_model(cfg.model)
        mesh = make_mesh(MeshConfig(-1, 1))
        state = create_state(model, cfg, mesh, steps_per_epoch=10)
        ckpt = Checkpointer(tmp_path / "ck", max_to_keep=3)
        for step in (1, 2):
            state = state.replace(step=jnp.asarray(step))
            ckpt.save(state)  # no metric → best manager stays empty
        (ckpt.directory / "best.json").write_text(
            json_.dumps({"step": 2, "metric": 0.5})
        )
        restored = ckpt.restore(state, best=True)
        assert int(jax.device_get(restored.step)) == 2


class TestScannedTraining:
    def test_steps_per_call_matches_single_step(self, tiny_run, tmp_path):
        """steps_per_call>1 (lax.scan chunking, one launch per K steps)
        must reproduce single-step training [VERDICT r1 item 8]."""
        import dataclasses

        cfg, _ = tiny_run
        cfg_scan = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, steps_per_call=2)
        )
        t1 = Trainer(cfg, tmp_path / "single")
        t1.fit(epochs=1)
        t2 = Trainer(cfg_scan, tmp_path / "scan")
        t2.fit(epochs=1)
        assert int(jax.device_get(t1.state.step)) == int(
            jax.device_get(t2.state.step)
        )
        for a, b in zip(
            jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-5, rtol=1e-5,
            )


class TestPreemptionAndResume:
    def test_mid_epoch_resume_step_accounting(self, tiny_run, tmp_path):
        """Restored step → (epoch, offset); fit completes exactly the
        remaining steps [SURVEY §5.3]."""
        cfg, _ = tiny_run
        trainer = Trainer(cfg, tmp_path / "resume_run")
        spe = trainer.data.steps("train")
        assert spe >= 1
        # Simulate a restore 1 step into epoch 0.
        trainer.state = trainer.state.replace(
            step=trainer.state.step + 1
        )
        trainer.fit(epochs=1)
        assert int(jax.device_get(trainer.state.step)) == spe

    def test_preemption_checkpoints_and_exits(self, tiny_run, tmp_path):
        """Fault injection [SURVEY §5.3]: a preemption signal mid-epoch
        saves a checkpoint and returns promptly."""
        cfg, _ = tiny_run
        workdir = tmp_path / "preempt_run"
        trainer = Trainer(cfg, workdir)
        trainer._preempted = True  # as the SIGTERM handler would set
        trainer.fit(epochs=1)
        assert int(jax.device_get(trainer.state.step)) == 1
        assert trainer.ckpt.latest_step() == 1
        # restart resumes from the preemption checkpoint
        trainer2 = Trainer(cfg, workdir)
        assert trainer2.resume_if_available()
        assert int(jax.device_get(trainer2.state.step)) == 1


class TestAsyncCheckpoint:
    def test_async_save_snapshots_at_call_time(self, tiny_run, tmp_path):
        """SURVEY §5.3 async checkpointing: save() must snapshot the
        device arrays BEFORE returning, because the train loop donates and
        overwrites the state buffers immediately after. We save, trash the
        live params, then restore — the restore must see the values at
        save time, bit-identically."""
        from btia_tpu.models.model import build_model
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh
        from btia_tpu.train.checkpoint import Checkpointer
        from btia_tpu.train.steps import create_state

        cfg, _ = tiny_run
        model = build_model(cfg.model)
        mesh = make_mesh(MeshConfig(-1, 1))
        state = create_state(model, cfg, mesh, steps_per_epoch=10)
        snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)

        ckpt = Checkpointer(tmp_path / "ck_async", async_save=True)
        assert ckpt.async_save
        state = state.replace(step=jnp.asarray(7))
        ckpt.save(state)  # returns before disk I/O completes
        # Simulate donation: overwrite the live params in place.
        state = state.replace(
            params=jax.tree.map(lambda x: x * 0 - 1.0, state.params)
        )
        restored = ckpt.restore(state)  # waits for the in-flight save
        assert int(jax.device_get(restored.step)) == 7
        for want, got in zip(
            jax.tree.leaves(snapshot), jax.tree.leaves(restored.params)
        ):
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


class TestMetrics:
    def test_accumulator_breakdowns(self):
        acc = EvalAccumulator()
        acc.add_batch(
            correct=np.array([True, False, True]),
            valid=np.array([True, True, True]),
            answer_types=["CLOSED", "CLOSED", "OPEN"],
            categories=["modality", "organ", "modality"],
        )
        s = acc.summary()
        assert s["accuracy"] == pytest.approx(2 / 3)
        assert s["closed_accuracy"] == pytest.approx(1 / 2)
        assert s["open_accuracy"] == pytest.approx(1.0)
        assert s["accuracy/modality"] == pytest.approx(1.0)

    def test_padding_rows_ignored(self):
        acc = EvalAccumulator()
        acc.add_batch(
            correct=np.array([True, True]),
            valid=np.array([True, False]),
            answer_types=["OPEN", "OPEN"],
            categories=["", ""],
        )
        assert len(acc.correct) == 1

    def test_bleu_perfect_and_zero(self):
        assert corpus_bleu(["left lung"], ["left lung"]) > 0.9
        assert corpus_bleu(["xyz"], ["abc def"]) < 0.4
