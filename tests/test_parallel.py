"""Distributed tier [SURVEY §4.2]: sharding specs, DP equivalence, TP rules
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from btia_tpu.parallel.mesh import MeshConfig, make_mesh
from btia_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    shard_batch,
)


class TestMesh:
    def test_full_data_mesh(self):
        mesh = make_mesh(MeshConfig(data=-1, model=1))
        assert mesh.shape == {"data": 8, "model": 1}

    def test_2x4_mesh(self):
        mesh = make_mesh(MeshConfig(data=4, model=2))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_factoring_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=3, model=1))


class TestShardingRules:
    def test_tp_rules_hit_attention_and_mlp(self):
        mesh = make_mesh(MeshConfig(data=4, model=2))
        params = {
            "block0": {
                "attn": {
                    "q_proj": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                    "o_proj": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                },
                "mlp": {
                    "fc1": {"kernel": np.zeros((8, 16)), "bias": np.zeros(16)},
                    "fc2": {"kernel": np.zeros((16, 8)), "bias": np.zeros(8)},
                },
                "ln1": {"scale": np.zeros(8)},
            }
        }
        sh = param_shardings(params, mesh, model_parallel=True)
        b = sh["block0"]
        assert b["attn"]["q_proj"]["kernel"].spec == P(None, "model")
        assert b["attn"]["q_proj"]["bias"].spec == P("model")
        assert b["attn"]["o_proj"]["kernel"].spec == P("model", None)
        assert b["attn"]["o_proj"]["bias"].spec == P()
        assert b["mlp"]["fc1"]["kernel"].spec == P(None, "model")
        assert b["mlp"]["fc2"]["kernel"].spec == P("model", None)
        assert b["ln1"]["scale"].spec == P()

    def test_no_model_parallel_replicates_all(self):
        mesh = make_mesh(MeshConfig(data=8, model=1))
        params = {"attn": {"q_proj": {"kernel": np.zeros((4, 4))}}}
        sh = param_shardings(params, mesh, model_parallel=False)
        assert sh["attn"]["q_proj"]["kernel"].spec == P()

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh(MeshConfig(data=8, model=1))
        batch = {"x": np.zeros((16, 3))}
        out = shard_batch(batch, mesh)
        assert out["x"].sharding.spec == batch_sharding(mesh).spec


class TestDPEquivalence:
    def test_dp8_matches_single_device_loss(self, tiny_cfg, synth_root):
        """One train step on a 1-device mesh vs the 8-device DP mesh must
        produce the same loss/grads — the psum-over-ICI correctness gate."""
        from btia_tpu.models.model import build_model
        from btia_tpu.train.steps import create_state, make_train_step

        model = build_model(tiny_cfg.model)
        rng = np.random.RandomState(0)
        batch = {
            "images": rng.randint(0, 255, (8, 96, 96, 3)).astype(np.uint8),
            "question_ids": rng.randint(
                1, 100, (8, tiny_cfg.model.max_question_len)
            ).astype(np.int32),
            "answer_ids": rng.randint(
                0, tiny_cfg.model.answer_vocab_size, (8,)
            ).astype(np.int32),
            "valid": np.ones((8,), bool),
        }

        losses = {}
        for n in (1, 8):
            mesh = make_mesh(
                MeshConfig(data=n, model=1), devices=jax.devices()[:n]
            )
            state = create_state(model, tiny_cfg, mesh, steps_per_epoch=4)
            step = make_train_step(model, tiny_cfg, mesh)
            db = shard_batch(dict(batch), mesh)
            _, m = step(state, db)
            losses[n] = float(jax.device_get(m["loss"]))
        assert losses[1] == pytest.approx(losses[8], rel=1e-4)

    def test_tp2_forward_matches_replicated(self, rng):
        """ViT block forward with TP=2 sharded params equals replicated."""
        from btia_tpu.core.dtypes import FP32_POLICY
        from btia_tpu.models.vit import ViTBlock

        block = ViTBlock(dim=32, num_heads=4, mlp_ratio=2.0, policy=FP32_POLICY)
        x = jnp.asarray(rng.randn(4, 10, 32), jnp.float32)
        params = block.init(jax.random.PRNGKey(0), x)["params"]
        ref = block.apply({"params": params}, x)

        mesh = make_mesh(MeshConfig(data=4, model=2))
        sh = param_shardings(params, mesh, model_parallel=True)
        params_tp = jax.tree.map(jax.device_put, params, sh)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, v: block.apply({"params": p}, v))(params_tp, xs)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), atol=1e-5
        )
