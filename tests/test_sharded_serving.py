"""Multi-chip serving equivalence [B:5 v5e-8 serving]: DP×TP sharded
serve == single-device serve, on the virtual 8-device mesh."""

import dataclasses

import jax
import numpy as np
import pytest

from btia_tpu.configs import get_config
from btia_tpu.infer.sharded import (
    make_sharded_serve_fn,
    make_sharded_serve_indexed_fn,
    shard_serving_params,
)
from btia_tpu.models.model import build_model
from btia_tpu.parallel.mesh import MeshConfig, make_mesh


@pytest.fixture(scope="module")
def serving_setup():
    base = get_config("tiny_test").model
    cfg = dataclasses.replace(
        base,
        question_encoder="bert",
        head="ad",
        num_answer_queries=8,
        bert_layers=1,
        bert_hidden=32,
        bert_heads=2,
        bert_vocab_size=64,
        max_question_len=8,
        mixed_precision=False,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    qids = rng.randint(1, 64, (8, 4, 8)).astype(np.int32)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": key, "dropout": key},
        images[:2],
        qids[:2, 0],
        train=False,
    )
    return model, variables, images, qids


class TestShardedServing:
    def test_dp8_matches_single(self, serving_setup):
        model, variables, images, qids = serving_setup
        ref = np.asarray(
            model.apply(variables, images, method="encode_image")
        )
        single = make_sharded_serve_fn(
            model, make_mesh(MeshConfig(1, 1), devices=jax.devices()[:1])
        )(variables, images, qids)

        mesh = make_mesh(MeshConfig(data=8, model=1))
        sharded_vars = shard_serving_params(variables, mesh)
        out = make_sharded_serve_fn(model, mesh)(sharded_vars, images, qids)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(out), atol=1e-4
        )

    def test_dp4_tp2_matches_single(self, serving_setup):
        model, variables, images, qids = serving_setup
        single = make_sharded_serve_fn(
            model, make_mesh(MeshConfig(1, 1), devices=jax.devices()[:1])
        )(variables, images, qids)

        mesh = make_mesh(MeshConfig(data=4, model=2))
        sharded_vars = shard_serving_params(variables, mesh)
        out = make_sharded_serve_fn(model, mesh)(sharded_vars, images, qids)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(out), atol=1e-4
        )

    def test_indexed_dp4_tp2_matches_plain(self, serving_setup):
        """Dedup serving on the mesh: unique tower sharded over 'data',
        per-pair gather crosses shards via XLA collectives — must equal
        the plain per-pair path bit-for-bit shapes aside."""
        model, variables, images, qids = serving_setup
        B, Q, S = qids.shape
        flat = qids.reshape(B * Q, S)
        uniq, inv = np.unique(flat, axis=0, return_inverse=True)
        U = 8  # pad to divide the data axis
        while U < len(uniq):
            U *= 2
        uniq = np.concatenate(
            [uniq, np.zeros((U - len(uniq), S), flat.dtype)]
        )
        qmap = inv.reshape(B, Q).astype(np.int32)

        mesh = make_mesh(MeshConfig(data=4, model=2))
        sharded_vars = shard_serving_params(variables, mesh)
        ref = make_sharded_serve_fn(model, mesh)(sharded_vars, images, qids)
        out = make_sharded_serve_indexed_fn(model, mesh)(
            sharded_vars, images, uniq, qmap
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), atol=1e-4
        )

    def test_topk_output(self, serving_setup):
        model, variables, images, qids = serving_setup
        mesh = make_mesh(MeshConfig(data=8, model=1))
        sharded_vars = shard_serving_params(variables, mesh)
        # Pretend the built vocab has 20 real answers: ids ≥20 are
        # static-head padding and must never be returned.
        vocab_len = 20
        vals, idxs = make_sharded_serve_fn(
            model, mesh, topk=3, vocab_limit=vocab_len
        )(sharded_vars, images, qids)
        assert vals.shape == (8, 4, 3)
        idxs = np.asarray(idxs)
        assert idxs.max() < vocab_len
        # <unk> (index 0) is never a real answer — same rule as every
        # other serving/eval surface.
        assert (idxs != 0).all()

    def test_topk_requires_vocab_limit(self, serving_setup):
        model, *_ = serving_setup
        mesh = make_mesh(MeshConfig(data=8, model=1))
        with pytest.raises(ValueError, match="vocab_limit"):
            make_sharded_serve_fn(model, mesh, topk=3)
        with pytest.raises(ValueError, match="vocab_limit"):
            make_sharded_serve_indexed_fn(model, mesh, topk=3)
