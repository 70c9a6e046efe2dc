"""Model-stack unit tests: shapes, dtypes, finiteness, staged API
[SURVEY §4.2 'Unit' tier]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btia_tpu.configs.config import ModelConfig
from btia_tpu.core.dtypes import FP32_POLICY
from btia_tpu.models.bert import BertQuestionEncoder, BertSpec
from btia_tpu.models.btia import BTIA
from btia_tpu.models.heads import ADHead, SimpleClassifier
from btia_tpu.models.lstm import LSTMQuestionEncoder
from btia_tpu.models.model import build_model
from btia_tpu.models.vit import ViTSpec, ViT


class TestEncoders:
    def test_lstm_shapes_and_mask(self, rng):
        enc = LSTMQuestionEncoder(
            vocab_size=50, embed_dim=16, hidden=24, policy=FP32_POLICY
        )
        ids = jnp.asarray(rng.randint(1, 50, (3, 10)), jnp.int32)
        ids = ids.at[:, 6:].set(0)
        vars_ = enc.init(jax.random.PRNGKey(0), ids)
        out, mask = enc.apply(vars_, ids)
        assert out.shape == (3, 10, 48)  # bidirectional concat
        assert bool((np.asarray(mask[:, 6:]) == False).all())  # noqa: E712

    def test_lstm_padding_invariance(self, rng):
        """Extra padding must not change the valid-token outputs."""
        enc = LSTMQuestionEncoder(
            vocab_size=50, embed_dim=8, hidden=12, policy=FP32_POLICY
        )
        short = jnp.asarray(rng.randint(1, 50, (1, 5)), jnp.int32)
        longer = jnp.concatenate([short, jnp.zeros((1, 4), jnp.int32)], axis=1)
        vars_ = enc.init(jax.random.PRNGKey(0), longer)
        out_s, _ = enc.apply(vars_, short)
        out_l, _ = enc.apply(vars_, longer)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_l[:, :5]), atol=1e-5
        )

    def test_bert_shapes(self, rng):
        spec = BertSpec(vocab_size=100, dim=32, depth=2, num_heads=4, mlp_dim=64)
        enc = BertQuestionEncoder(spec=spec, policy=FP32_POLICY)
        ids = jnp.asarray(rng.randint(1, 100, (2, 12)), jnp.int32)
        vars_ = enc.init(jax.random.PRNGKey(0), ids)
        out, mask = enc.apply(vars_, ids)
        assert out.shape == (2, 12, 32)
        assert bool(jnp.isfinite(out).all())

    def test_vit_shapes(self, rng):
        spec = ViTSpec(image_size=32, patch_size=8, dim=48, depth=2, num_heads=4)
        vit = ViT(spec=spec, policy=FP32_POLICY)
        imgs = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        vars_ = vit.init(jax.random.PRNGKey(0), imgs)
        out = vit.apply(vars_, imgs)
        assert out.shape == (2, 17, 48)  # 16 patches + CLS


class TestFusionAndHeads:
    def test_btia_shapes(self, rng):
        btia = BTIA(dim=32, num_heads=4, num_layers=2, policy=FP32_POLICY)
        img = jnp.asarray(rng.randn(2, 9, 32), jnp.float32)
        txt = jnp.asarray(rng.randn(2, 6, 32), jnp.float32)
        mask = jnp.asarray(rng.rand(2, 6) > 0.3)
        vars_ = btia.init(jax.random.PRNGKey(0), img, txt, mask)
        oi, ot = btia.apply(vars_, img, txt, mask)
        assert oi.shape == img.shape and ot.shape == txt.shape

    def test_ad_head_per_answer(self, rng):
        head = ADHead(dim=32, num_heads=4, vocab_size=20, policy=FP32_POLICY)
        toks = jnp.asarray(rng.randn(2, 12, 32), jnp.float32)
        mask = jnp.ones((2, 12), bool)
        vars_ = head.init(jax.random.PRNGKey(0), toks, mask)
        logits = head.apply(vars_, toks, mask)
        assert logits.shape == (2, 20)
        assert logits.dtype == jnp.float32

    def test_ad_head_factorized(self, rng):
        head = ADHead(
            dim=32, num_heads=4, vocab_size=100, num_queries=8, policy=FP32_POLICY
        )
        toks = jnp.asarray(rng.randn(2, 12, 32), jnp.float32)
        vars_ = head.init(jax.random.PRNGKey(0), toks, None)
        logits = head.apply(vars_, toks, None)
        assert logits.shape == (2, 100)

    def test_simple_classifier(self, rng):
        head = SimpleClassifier(dim=32, vocab_size=10, policy=FP32_POLICY)
        img = jnp.asarray(rng.randn(2, 9, 32), jnp.float32)
        txt = jnp.asarray(rng.randn(2, 6, 32), jnp.float32)
        vars_ = head.init(jax.random.PRNGKey(0), img, txt, None)
        assert head.apply(vars_, img, txt, None).shape == (2, 10)


class TestFullModel:
    def test_forward(self, tiny_cfg, tiny_model_and_vars, rng):
        model, variables = tiny_model_and_vars
        imgs = jnp.asarray(rng.randint(0, 255, (2, 96, 96, 3)), jnp.uint8)
        qids = jnp.asarray(
            rng.randint(1, 100, (2, tiny_cfg.model.max_question_len)), jnp.int32
        )
        logits = model.apply(variables, imgs, qids)
        assert logits.shape == (2, tiny_cfg.model.answer_vocab_size)
        assert bool(jnp.isfinite(logits).all())

    def test_fanout_matches_single(self, tiny_cfg, tiny_model_and_vars, rng):
        """answer_questions (encode-once fan-out) must equal per-question
        forward passes — the batched-inference correctness contract [B:5]."""
        model, variables = tiny_model_and_vars
        imgs = jnp.asarray(rng.randint(0, 255, (1, 96, 96, 3)), jnp.uint8)
        L = tiny_cfg.model.max_question_len
        q1 = jnp.asarray(rng.randint(1, 100, (1, L)), jnp.int32)
        q2 = jnp.asarray(rng.randint(1, 100, (1, L)), jnp.int32)

        single1 = model.apply(variables, imgs, q1)
        single2 = model.apply(variables, imgs, q2)

        img_tok = model.apply(variables, imgs, method="encode_image")
        fan = model.apply(
            variables,
            img_tok,
            jnp.stack([q1, q2], axis=1),
            method="answer_questions",
        )
        np.testing.assert_allclose(
            np.asarray(fan[0, 0]), np.asarray(single1[0]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(fan[0, 1]), np.asarray(single2[0]), atol=1e-4
        )

    def test_int8_ffn_serving_close_and_training_exact(self, tiny_cfg, rng):
        """int8_ffn routes serving FFNs through the fused Pallas kernel:
        outputs stay close to fp (PTQ noise), and the train-mode forward is
        bit-identical to the flag-off model (int8 is inference-only)."""
        import dataclasses

        base = dataclasses.replace(
            tiny_cfg.model, mixed_precision=True, dropout=0.0
        )
        m_fp = build_model(base)
        m_i8 = build_model(dataclasses.replace(base, int8_ffn=True))
        imgs = jnp.asarray(rng.randint(0, 255, (2, 96, 96, 3)), jnp.uint8)
        qids = jnp.asarray(
            rng.randint(1, 100, (2, base.max_question_len)), jnp.int32
        )
        key = jax.random.PRNGKey(0)
        variables = m_fp.init({"params": key, "dropout": key}, imgs, qids)
        # identical param trees: the int8 model must accept fp variables
        fp = np.asarray(m_fp.apply(variables, imgs, qids), np.float32)
        i8 = np.asarray(m_i8.apply(variables, imgs, qids), np.float32)
        assert np.isfinite(i8).all()
        scale = np.abs(fp).max() + 1e-6
        assert np.abs(i8 - fp).max() / scale < 0.15, (
            np.abs(i8 - fp).max() / scale
        )
        # train mode: int8 disabled, forwards bit-identical
        rngs = {"dropout": jax.random.PRNGKey(1)}
        fp_t, _ = m_fp.apply(
            variables, imgs, qids, train=True, rngs=rngs,
            mutable=["batch_stats"],
        )
        i8_t, _ = m_i8.apply(
            variables, imgs, qids, train=True, rngs=rngs,
            mutable=["batch_stats"],
        )
        np.testing.assert_array_equal(np.asarray(fp_t), np.asarray(i8_t))

    def test_all_registered_configs_validate(self):
        from btia_tpu.configs import get_config, list_configs

        for name in list_configs():
            cfg = get_config(name)
            assert cfg.model.image_dim > 0

    def test_vit_config_builds(self, rng):
        cfg = ModelConfig(
            image_encoder="vit_b16",
            question_encoder="bert",
            hidden_dim=64,
            num_heads=4,
            btia_layers=1,
            head="ad",
            answer_vocab_size=16,
            bert_layers=1,
            bert_hidden=32,
            bert_heads=2,
            bert_vocab_size=100,
            max_question_len=8,
            mixed_precision=False,
        )
        model = build_model(cfg)
        imgs = jnp.zeros((1, 256, 256, 3), jnp.uint8)
        qids = jnp.ones((1, 8), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), imgs, qids)
        logits = model.apply(variables, imgs, qids)
        assert logits.shape == (1, 16)


class TestFusedWiring:
    """Whole-module equivalence: fused vs unfused routing through the
    REAL modules (BTIALayer's six projections, the AD head's static-q
    table, BertLayer's self-attention). A swapped weight/operand in the
    fused wiring would pass op-level tests but fail here."""

    def _patched(self, monkeypatch):
        from btia_tpu.ops import fused_attn as FA

        orig_dense = FA.fused_dense_attention
        orig_static = FA.fused_static_q_attention
        monkeypatch.setattr(
            FA,
            "fused_dense_attention",
            lambda *a, **k: orig_dense(*a, interpret=True, **k),
        )
        monkeypatch.setattr(
            FA,
            "fused_static_q_attention",
            lambda *a, **k: orig_static(*a, interpret=True, **k),
        )

    def test_btia_layer(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from btia_tpu.core.dtypes import FP32_POLICY
        from btia_tpu.models.btia import BTIALayer

        mod = BTIALayer(dim=128, num_heads=2, mlp_ratio=2.0, policy=FP32_POLICY)
        img = jnp.asarray(rng.randn(3, 18, 128), jnp.float32)
        txt = jnp.asarray(rng.randn(3, 10, 128), jnp.float32)
        mask = jnp.asarray(rng.rand(3, 10) > 0.3).at[:, 0].set(True)
        variables = mod.init(jax.random.PRNGKey(0), img, txt, mask)
        ref = mod.apply(variables, img, txt, mask)  # CPU → unfused
        self._patched(monkeypatch)
        out = mod.apply(variables, img, txt, mask)  # forced fused kernels
        for o, r in zip(out, ref):
            np.testing.assert_allclose(
                np.asarray(o), np.asarray(r), atol=3e-4
            )

    def test_ad_head(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from btia_tpu.core.dtypes import FP32_POLICY
        from btia_tpu.models.heads import ADHead

        mod = ADHead(dim=128, num_heads=2, vocab_size=16, policy=FP32_POLICY)
        tokens = jnp.asarray(rng.randn(3, 12, 128), jnp.float32)
        mask = jnp.asarray(rng.rand(3, 12) > 0.3).at[:, 0].set(True)
        variables = mod.init(jax.random.PRNGKey(0), tokens, mask)
        ref = mod.apply(variables, tokens, mask)
        self._patched(monkeypatch)
        out = mod.apply(variables, tokens, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    def test_bert_layer(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from btia_tpu.core.dtypes import FP32_POLICY
        from btia_tpu.models.bert import BertLayer, BertSpec

        spec = BertSpec(dim=128, depth=1, num_heads=2, mlp_dim=256)
        mod = BertLayer(spec, FP32_POLICY)
        x = jnp.asarray(rng.randn(3, 10, 128), jnp.float32)
        mask = jnp.asarray(rng.rand(3, 10) > 0.3).at[:, 0].set(True)
        variables = mod.init(jax.random.PRNGKey(0), x, mask)
        ref = mod.apply(variables, x, mask)
        self._patched(monkeypatch)
        out = mod.apply(variables, x, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)
