"""BERT-base question encoder [B:5, B:8] — Flax, fused Pallas self-attention.

Faithful to the HF/google BERT-base architecture (post-LN, GELU, learned
position + token-type embeddings, LayerNorm eps 1e-12 — the parity-critical
constant, SURVEY §7.3) so converted ``bert-base-uncased`` checkpoints drop
in. Attention runs through the shared fused kernel (ops.mha).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.core.dtypes import DTypePolicy
from btia_tpu.models.layers import Mlp, MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class BertSpec:
    vocab_size: int = 30522
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_len: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12


class BertLayer(nn.Module):
    spec: BertSpec
    policy: DTypePolicy
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array], deterministic: bool = True
    ) -> jax.Array:
        s = self.spec
        ln = lambda name: nn.LayerNorm(
            epsilon=s.ln_eps,
            name=name,
            dtype=self.policy.accum_dtype,
            param_dtype=self.policy.param_dtype,
        )
        # Site fusion (ops.fused_attn SiteCfg): BERT's post-LN epilogue —
        # LN(x + attn), eps 1e-12 — folds into the fused attention kernel
        # when dropout between attention and residual is inactive; the
        # unfused road applies the identical composition in XLA
        # (ops.norms.layernorm — same fast-variance f32 formula as
        # flax.nn.LayerNorm).
        from btia_tpu.models.layers import LayerNormParams
        from btia_tpu.ops.norms import layernorm

        ln_attn = LayerNormParams(
            self.policy.param_dtype, epsilon=s.ln_eps, name="ln_attn"
        )(s.dim)
        fuse = deterministic or self.dropout == 0.0
        mha = MultiHeadAttention(s.dim, s.num_heads, self.policy, name="attn")
        if fuse:
            x = mha(x, kv_mask=mask, residual=True, post_ln=ln_attn)
        else:
            attn = mha(x, kv_mask=mask)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            x = layernorm(x + attn, ln_attn[0], ln_attn[1], s.ln_eps).astype(
                self.policy.compute_dtype
            )
        mlp = Mlp(s.dim, s.mlp_dim, self.policy, name="mlp")(
            x, deterministic=deterministic
        )
        mlp = nn.Dropout(self.dropout)(mlp, deterministic=deterministic)
        return ln("ln_mlp")(x + mlp).astype(self.policy.compute_dtype)


class BertQuestionEncoder(nn.Module):
    """WordPiece ids → contextual token features. Returns (feats, mask)."""

    spec: BertSpec = BertSpec()
    policy: DTypePolicy = DTypePolicy()
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        token_ids: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        s = self.spec
        if mask is None:
            mask = token_ids > 0  # WordPiece PAD = 0
        B, S = token_ids.shape
        embed = lambda v, name: nn.Embed(
            v, s.dim, name=name, dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        words = embed(s.vocab_size, "word_embed")(token_ids)
        pos_ids = jnp.arange(S)[None, :]
        pos = embed(s.max_len, "pos_embed")(pos_ids)
        types = embed(s.type_vocab, "type_embed")(jnp.zeros_like(token_ids))
        x = nn.LayerNorm(
            epsilon=s.ln_eps,
            name="ln_embed",
            dtype=self.policy.accum_dtype,
            param_dtype=self.policy.param_dtype,
        )(words + pos + types).astype(self.policy.compute_dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        for i in range(s.depth):
            x = BertLayer(s, self.policy, self.dropout, name=f"layer{i}")(
                x, mask, deterministic=not train
            )
        return x, mask
