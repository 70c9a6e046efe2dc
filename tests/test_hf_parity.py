"""Behavioral parity of the HF/torchvision weight maps: convert REAL HF
module weights (random-init, offline) into our encoders and compare
features. Proves pretrained checkpoints load correctly once available
[SURVEY §7.1]."""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from btia_tpu.convert.hf import bert_params_from_hf, vit_params_from_hf
from btia_tpu.core.dtypes import FP32_POLICY
from btia_tpu.models.bert import BertQuestionEncoder, BertSpec
from btia_tpu.models.vit import ViT, ViTSpec


class TestHFBert:
    def test_feature_parity(self, rng):
        from transformers import BertConfig, BertModel

        hf_cfg = BertConfig(
            vocab_size=120,
            hidden_size=48,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=96,
            max_position_embeddings=64,
            hidden_act="gelu",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        hf = BertModel(hf_cfg).eval()

        spec = BertSpec(
            vocab_size=120, dim=48, depth=2, num_heads=4, mlp_dim=96, max_len=64
        )
        ours = BertQuestionEncoder(spec=spec, policy=FP32_POLICY)
        ids = rng.randint(1, 120, (2, 10)).astype(np.int64)
        ids[:, 7:] = 0
        template = ours.init(jax.random.PRNGKey(0), ids.astype(np.int32))
        converted = {"params": bert_params_from_hf(hf.state_dict())}

        chex_tree = jax.tree.structure(template["params"])
        conv_tree = jax.tree.structure(converted["params"])
        assert chex_tree == conv_tree, f"{chex_tree}\n!=\n{conv_tree}"

        with torch.no_grad():
            hf_out = hf(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy((ids > 0).astype(np.int64)),
            ).last_hidden_state.numpy()
        ours_out, _ = ours.apply(converted, ids.astype(np.int32))
        # Compare on valid tokens only (HF computes padded positions too,
        # with the same masked attention — values should match everywhere).
        np.testing.assert_allclose(
            np.asarray(ours_out), hf_out, atol=2e-4
        )


class TestHFViT:
    def test_feature_parity(self, rng):
        from transformers import ViTConfig, ViTModel

        hf_cfg = ViTConfig(
            image_size=32,
            patch_size=8,
            hidden_size=48,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=96,
            hidden_act="gelu",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-6,
        )
        torch.manual_seed(0)
        hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()

        spec = ViTSpec(
            image_size=32, patch_size=8, dim=48, depth=2, num_heads=4,
            mlp_ratio=2.0,
        )
        ours = ViT(spec=spec, policy=FP32_POLICY)
        imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
        template = ours.init(jax.random.PRNGKey(0), imgs)
        converted = {"params": vit_params_from_hf(hf.state_dict())}
        assert jax.tree.structure(template["params"]) == jax.tree.structure(
            converted["params"]
        )

        with torch.no_grad():
            hf_out = hf(
                pixel_values=torch.from_numpy(imgs).permute(0, 3, 1, 2)
            ).last_hidden_state.numpy()
        ours_out = ours.apply(converted, imgs)
        np.testing.assert_allclose(np.asarray(ours_out), hf_out, atol=2e-4)


class TestTorchvisionResNetMap:
    def test_synthetic_torchvision_statedict(self, rng):
        """No torchvision on this machine — build a state_dict in its
        naming from our own TorchResNet and check the map round-trips."""
        from btia_tpu.convert.hf import resnet_params_from_torchvision
        from btia_tpu.convert.torch_ref import TorchResNet
        from btia_tpu.models.resnet import ResNet, STAGE_SIZES

        tm = TorchResNet(STAGE_SIZES["resnet_tiny"])
        sd = {}
        rename = {"stem_conv": "conv1", "stem_bn": "bn1"}
        for k, v in tm.state_dict().items():
            parts = k.split(".")
            if parts[0] in rename:
                sd[f"{rename[parts[0]]}.{parts[1]}"] = v
            else:
                m = parts[0]  # stageS_blockB
                stage, block = m.replace("stage", "").split("_block")
                mod = parts[1]
                mod = {"downsample_conv": "downsample.0", "downsample_bn": "downsample.1"}.get(mod, mod)
                sd[f"layer{stage}.{block}.{mod}." + ".".join(parts[2:])] = v
        converted = resnet_params_from_torchvision(sd)
        assert "stem_conv" in converted["params"]
        assert "stage1_block0" in converted["params"]
        assert converted["params"]["stem_conv"]["kernel"].shape == (7, 7, 3, 64)
        assert converted["batch_stats"]["stem_bn"]["mean"].shape == (64,)
