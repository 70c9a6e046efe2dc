"""Answer heads: attention-driven decoding (AD) and the plain classifier.

AD head [B:5 "attention-driven answer head", B:10 "attention-driven answer
decoding"]: answer prediction ATTENDS over the fused multimodal tokens
(answer-querying decoder lineage, cf. Q2ATransformer PAPERS.md:6) instead of
pooling + MLP. Two modes:

  * per-answer queries (num_queries == 0): one learned query per answer
    candidate; its attended feature is scored against its own weight vector
    — supports the small closed vocab [B:7].
  * factorized (num_queries = K < vocab): K learned queries attend, their
    features are pooled and scored against a learned answer-embedding table
    — keeps the attention cost independent of the 4k-answer PathVQA vocab
    [B:9 "large answer vocabulary head"].

Both run on the shared fused Pallas attention kernel (ops.mha).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.core.dtypes import DTypePolicy
from btia_tpu.models.layers import LayerNorm, Mlp, masked_mean


class ADHead(nn.Module):
    dim: int
    num_heads: int
    vocab_size: int
    num_queries: int = 0  # 0 → one query per answer
    mlp_ratio: float = 2.0
    policy: DTypePolicy = DTypePolicy()
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (B, N, D) fused img+txt tokens
        token_mask: Optional[jax.Array],  # (B, N) True=valid
        deterministic: bool = True,
    ) -> jax.Array:
        K = self.num_queries or self.vocab_size
        queries = self.param(
            "answer_queries",
            nn.initializers.truncated_normal(0.02),
            (K, self.dim),
            self.policy.param_dtype,
        )
        from btia_tpu.models.layers import DenseParams, LayerNormParams
        from btia_tpu.ops.fused_attn import fused_static_q_attention

        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        # Site fusion (ops.fused_attn SiteCfg): the head's pre-attention
        # LayerNorm on the fused-token stream and the `queries + attended`
        # residual fold INTO the kernel — the (B, N, D) stream is read
        # raw once and normalized in VMEM, and the (K, D) query table
        # (already resident) adds in the epilogue. The unfused road
        # applies the identical composition (ops.norms.layernorm).
        ln_kv = LayerNormParams(pd, name="ln_kv")(tokens.shape[-1])
        params = lambda name, din: DenseParams(self.dim, pd, name=name)(din)
        wq, bq = params("q_proj", self.dim)
        wk, bk = params("k_proj", tokens.shape[-1])
        wv, bv = params("v_proj", tokens.shape[-1])
        wo, bo = params("o_proj", self.dim)
        # Queries are batch-invariant: the fused serving path projects the
        # (K, D) table once and keeps it VMEM-resident, with k/v/o
        # projections fused into the kernel (ops/fused_attn.py).
        feats = fused_static_q_attention(
            queries.astype(cd), tokens.astype(cd), token_mask,
            wq, bq, wk, bk, wv, bv, wo, bo, self.num_heads,
            kv_ln=ln_kv, residual=True,
        )
        feats = feats + Mlp(
            self.dim,
            int(self.dim * self.mlp_ratio),
            self.policy,
            dropout=self.dropout,
            name="mlp",
        )(LayerNorm(self.policy, name="ln_mlp")(feats), deterministic)
        feats = LayerNorm(self.policy, name="ln_out")(feats)

        if self.num_queries == 0:
            # Per-answer score: <feat_a, w_a> + b_a, one weight row per answer.
            w = self.param(
                "answer_weights",
                nn.initializers.truncated_normal(0.02),
                (self.vocab_size, self.dim),
                self.policy.param_dtype,
            )
            b = self.param(
                "answer_bias", nn.initializers.zeros, (self.vocab_size,),
                self.policy.param_dtype,
            )
            logits = (
                jnp.einsum(
                    "bad,ad->ba",
                    feats.astype(self.policy.accum_dtype),
                    w.astype(self.policy.accum_dtype),
                )
                + b
            )
        else:
            pooled = jnp.mean(feats, axis=1)  # (B, D)
            table = self.param(
                "answer_table",
                nn.initializers.truncated_normal(0.02),
                (self.vocab_size, self.dim),
                self.policy.param_dtype,
            )
            b = self.param(
                "answer_bias", nn.initializers.zeros, (self.vocab_size,),
                self.policy.param_dtype,
            )
            logits = (
                pooled.astype(self.policy.accum_dtype)
                @ table.astype(self.policy.accum_dtype).T
                + b
            )
        return logits.astype(jnp.float32)


class SimpleClassifier(nn.Module):
    """Pool-and-MLP head used by the ablation configs [SURVEY §2.1]."""

    dim: int
    vocab_size: int
    hidden_mult: float = 2.0
    policy: DTypePolicy = DTypePolicy()
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        img_tokens: jax.Array,
        txt_tokens: jax.Array,
        txt_mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        img_pooled = jnp.mean(img_tokens, axis=1)
        txt_pooled = masked_mean(txt_tokens, txt_mask)
        joint = jnp.concatenate([img_pooled, txt_pooled], axis=-1)
        x = nn.Dense(
            int(self.dim * self.hidden_mult),
            name="fc1",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(joint)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        logits = nn.Dense(
            self.vocab_size,
            name="fc_out",
            dtype=self.policy.accum_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        return logits.astype(jnp.float32)
