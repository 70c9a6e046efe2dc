"""Vision Transformer image encoders: ViT-B/16 (224) and ViT-L/336 [B:9, B:11].

TPU-first choices:
  * patchify is a single (B, N, P²·3) × (P²·3, D) matmul (reshape, not conv)
    — identical math to the conv patch-embed, friendlier to the MXU;
  * self-attention runs through the shared fused Pallas kernel (ops.mha);
  * pre-LN blocks; bf16 compute, fp32 LayerNorm/softmax;
  * q/k/v/o and fc1/fc2 names make ViT-L TP-shardable over the 'model' mesh
    axis for the streaming config [B:11, SURVEY §2.5].
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.core.dtypes import DTypePolicy
from btia_tpu.models.layers import LayerNorm, Mlp, MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    image_size: int
    patch_size: int
    dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:  # patches + CLS
        return self.grid * self.grid + 1


VIT_SPECS = {
    "vit_b16": ViTSpec(image_size=224, patch_size=16, dim=768, depth=12, num_heads=12),
    "vit_l336": ViTSpec(image_size=336, patch_size=14, dim=1024, depth=24, num_heads=16),
    # CPU-scale ViT for tests and the image_pool_grid ablation
    # (benchmarks/pool_accuracy.py): 12x12 grid + CLS = 145 tokens.
    "vit_test": ViTSpec(image_size=96, patch_size=8, dim=64, depth=2, num_heads=4),
}


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    policy: DTypePolicy
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        y = LayerNorm(self.policy, name="ln1")(x)
        x = x + MultiHeadAttention(self.dim, self.num_heads, self.policy, name="attn")(y)
        y = LayerNorm(self.policy, name="ln2")(x)
        x = x + Mlp(
            self.dim,
            int(self.dim * self.mlp_ratio),
            self.policy,
            dropout=self.dropout,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


class ViT(nn.Module):
    """Returns all tokens (CLS + patches): (B, N+1, D)."""

    spec: ViTSpec
    policy: DTypePolicy = DTypePolicy()
    dropout: float = 0.0
    remat: bool = False  # jax.checkpoint per block: trade FLOPs for HBM

    @nn.compact
    def __call__(
        self, images: jax.Array, train: bool = False
    ) -> jax.Array:
        s = self.spec
        B, H, W, C = images.shape
        assert H == s.image_size and W == s.image_size, (
            f"expected {s.image_size}px input, got {H}x{W}"
        )
        x = images.astype(self.policy.compute_dtype)
        # Patchify as a reshape + matmul (MXU-native patch embedding).
        g, p = s.grid, s.patch_size
        x = x.reshape(B, g, p, g, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g * g, p * p * C)
        x = nn.Dense(
            s.dim,
            name="patch_embed",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        cls = self.param(
            "cls_token",
            nn.initializers.truncated_normal(0.02),
            (1, 1, s.dim),
            self.policy.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, s.dim)).astype(x.dtype), x], axis=1
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, s.num_tokens, s.dim),
            self.policy.param_dtype,
        )
        x = x + pos.astype(x.dtype)
        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        for i in range(s.depth):
            x = block_cls(
                s.dim,
                s.num_heads,
                s.mlp_ratio,
                self.policy,
                dropout=self.dropout,
                name=f"block{i}",
            )(x, deterministic=not train)
        return LayerNorm(self.policy, name="ln_final")(x)


def build_vit(
    name: str,
    policy: DTypePolicy = DTypePolicy(),
    dropout: float = 0.0,
    remat: bool = False,
) -> ViT:
    return ViT(spec=VIT_SPECS[name], policy=policy, dropout=dropout, remat=remat)
