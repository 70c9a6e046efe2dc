"""ResNet-50 image encoder (Flax, NHWC) — TPU-native counterpart of the
reference's torchvision backbone [B:5 "CNN…image encoder", B:7 "ResNet-50
features"; SURVEY §2.1].

Returns the 7×7 grid of 2048-d features as 49 tokens — the region-feature
interface the BTIA fusion consumes. Convolutions lower straight onto the MXU
via XLA (no custom kernel needed, SURVEY §2.4); layout is NHWC, the TPU-fast
convention (torchvision is NCHW — the checkpoint converter transposes).

Parity notes for the converter (btia_tpu/convert/): torchvision bottleneck
order conv1(1x1)→bn→relu→conv2(3x3,stride)→bn→relu→conv3(1x1)→bn, residual
downsample = conv(1x1,stride)+bn, stem = 7x7/2 conv + maxpool 3x3/2.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.core.dtypes import DTypePolicy

STAGE_SIZES = {  # torchvision layer multiplicities
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet_tiny": (1, 1, 1, 1),  # tests/CI only
    # 3-stage variant (16× downsample, 1024-d): an 8×8 token grid at
    # 128 px — CNN texture bias with enough spatial resolution for the
    # routed-attribute synthetic studies (resnet_tiny's 2×2 grid cannot
    # separate the five organ sites; a from-scratch vit_test lacks the
    # inductive bias to read sub-patch glyph attributes).
    "resnet_small": (1, 1, 1),
    # 2-stage variant (8× downsample, 512-d): 16×16 grid at 128 px.
    # The r5 glyph probe (BENCH_NOTES) showed the 45-conjunction corpus
    # is trivially readable at 8 px cells (small CNN: 0.98 val) while
    # the 16×-downsampled resnet_small VQA tower stayed memorization-
    # bound — attribute studies need the finer grid.
    "resnet_xsmall": (1, 1),
}


class Bottleneck(nn.Module):
    features: int  # width of the 3x3 conv; out channels = 4*features
    stride: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, s, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            name=name,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name=name,
            dtype=self.policy.accum_dtype,
            param_dtype=self.policy.param_dtype,
        )
        residual = x
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.features, 3, self.stride, "conv2")(y)))
        y = bn("bn3")(conv(4 * self.features, 1, 1, "conv3")(y))
        if residual.shape[-1] != 4 * self.features or self.stride != 1:
            residual = bn("downsample_bn")(
                conv(4 * self.features, 1, self.stride, "downsample_conv")(residual)
            )
        return nn.relu((y + residual).astype(self.policy.compute_dtype))


class ResNet(nn.Module):
    """Feature-grid ResNet. Output: (B, H/32 * W/32, 2048) tokens."""

    stage_sizes: Sequence[int] = STAGE_SIZES["resnet50"]
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.policy.compute_dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            name="stem_conv",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="stem_bn",
            dtype=self.policy.accum_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.relu(x.astype(self.policy.compute_dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                x = Bottleneck(
                    features=64 * 2**stage,
                    stride=2 if (block == 0 and stage > 0) else 1,
                    policy=self.policy,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train=train)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


def build_resnet(name: str, policy: DTypePolicy = DTypePolicy()) -> ResNet:
    return ResNet(stage_sizes=STAGE_SIZES[name], policy=policy)


def resnet50(policy: DTypePolicy = DTypePolicy()) -> ResNet:
    return build_resnet("resnet50", policy)
