"""BTIA — Bidirectional Text–Image Attention fusion block (core novelty).

Per [B:5] the reference fuses image and question features with a
"bidirectional image↔question cross-attention fusion block": each layer runs
question-guided image attention AND image-guided question attention, then
per-stream FFNs. Here both directions execute inside ONE fused Pallas kernel
(ops.bicross.bicross_attention) per layer — all six Q/K/V projections of a
layer feed a single pallas_call, keeping both score tiles in VMEM [B:5
"rewritten as fused Pallas attention kernels"].

Block structure (pre-LN, residual):

    img' = img + O_i( Attn(Q(LN img), K(LN txt), V(LN txt)) )   # img ← txt
    txt' = txt + O_t( Attn(Q(LN txt), K(LN img), V(LN img)) )   # txt ← img
    img  = img' + FFN_i(LN img')
    txt  = txt' + FFN_t(LN txt')
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax

from btia_tpu.core.dtypes import DTypePolicy
from btia_tpu.models.layers import LayerNorm, Mlp, heads_bshd
from btia_tpu.ops.bicross import bicross_bshd


class BTIALayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    policy: DTypePolicy
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        img: jax.Array,
        txt: jax.Array,
        txt_mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        dense = lambda scope, name: nn.Dense(
            self.dim,
            name=f"{scope}_{name}",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        img_n = LayerNorm(self.policy, name="ln_img")(img)
        txt_n = LayerNorm(self.policy, name="ln_txt")(txt)

        # Six projections feeding the ONE fused bidirectional kernel
        # (projection-native BSHD layout — no head-transpose copies on
        # the short-sequence path).
        sh = lambda x: heads_bshd(x, self.num_heads)
        qi = sh(dense("i2t", "q_proj")(img_n))  # img queries
        ki = sh(dense("t2i", "k_proj")(img_n))  # img keys (for txt←img)
        vi = sh(dense("t2i", "v_proj")(img_n))
        qt = sh(dense("t2i", "q_proj")(txt_n))  # txt queries
        kt = sh(dense("i2t", "k_proj")(txt_n))  # txt keys (for img←txt)
        vt = sh(dense("i2t", "v_proj")(txt_n))

        out_i, out_t = bicross_bshd(qi, ki, vi, qt, kt, vt, txt_mask)
        Bi, Ni = img.shape[:2]
        Nt = txt.shape[1]

        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)
        img = img + drop(dense("i2t", "o_proj")(out_i.reshape(Bi, Ni, -1)))
        txt = txt + drop(dense("t2i", "o_proj")(out_t.reshape(Bi, Nt, -1)))

        img = img + drop(
            Mlp(
                self.dim,
                int(self.dim * self.mlp_ratio),
                self.policy,
                name="mlp_img",
            )(LayerNorm(self.policy, name="ln_img2")(img), deterministic)
        )
        txt = txt + drop(
            Mlp(
                self.dim,
                int(self.dim * self.mlp_ratio),
                self.policy,
                name="mlp_txt",
            )(LayerNorm(self.policy, name="ln_txt2")(txt), deterministic)
        )
        return img, txt


class BTIA(nn.Module):
    """Stack of BTIALayers over projected image/question token streams."""

    dim: int
    num_heads: int
    num_layers: int
    mlp_ratio: float = 4.0
    policy: DTypePolicy = DTypePolicy()
    dropout: float = 0.0
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        img_feats: jax.Array,
        txt_feats: jax.Array,
        txt_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        layer_cls = (
            nn.remat(BTIALayer, static_argnums=(4,)) if self.remat else BTIALayer
        )
        for i in range(self.num_layers):
            img_feats, txt_feats = layer_cls(
                self.dim,
                self.num_heads,
                self.mlp_ratio,
                self.policy,
                self.dropout,
                name=f"layer{i}",
            )(img_feats, txt_feats, txt_mask, deterministic)
        return img_feats, txt_feats
