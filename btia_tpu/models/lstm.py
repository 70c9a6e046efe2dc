"""LSTM question encoder — `lax.scan` over time, XLA-compiled [SURVEY §2.1].

The reference wraps ``nn.LSTM`` (cuDNN) over learned word embeddings [B:5
"LSTM question encoder", B:7]. The TPU-native form is a scan whose per-step
body is ONE fused (B, E+H) × (E+H, 4H) matmul — XLA unrolls/pipelines this
well at question lengths ≤ 64; no Pallas kernel is warranted (SURVEY §2.4).

Gate ordering follows PyTorch (i, f, g, o) so the checkpoint converter can
copy cuDNN weights without permutation [SURVEY §7.3 "LSTM gate ordering"].
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.core.dtypes import DTypePolicy


class LSTMLayer(nn.Module):
    hidden: int
    policy: DTypePolicy
    reverse: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """x: (B, S, E) → (B, S, H). Padded steps carry state through."""
        B, S, E = x.shape
        H = self.hidden
        wx = nn.Dense(
            4 * H,
            name="ih",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        # Recurrent weights as raw params — concrete arrays are safe to
        # close over inside the raw lax.scan body (a linen submodule is not).
        w_hh = self.param(
            "hh_kernel",
            nn.initializers.lecun_normal(),
            (H, 4 * H),
            self.policy.param_dtype,
        ).astype(self.policy.compute_dtype)
        b_hh = self.param(
            "hh_bias", nn.initializers.zeros, (4 * H,), self.policy.param_dtype
        ).astype(self.policy.compute_dtype)
        # Precompute input projections for all steps in one big matmul (MXU),
        # leaving only the (B, H) x (H, 4H) recurrent matmul inside the scan.
        xz = wx(x)  # (B, S, 4H)

        def cell(carry, inputs):
            h, c = carry
            xz_t, m_t = inputs
            z = xz_t + h @ w_hh + b_hh
            i, f, g, o = jnp.split(z, 4, axis=-1)  # PyTorch gate order
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            if m_t is not None:
                m = m_t[:, None].astype(h_new.dtype)
                h_new = m * h_new + (1 - m) * h
                c_new = m * c_new + (1 - m) * c
            return (h_new, c_new), h_new

        h0 = jnp.zeros((B, H), self.policy.compute_dtype)
        carry = (h0, h0)
        xs = (
            jnp.moveaxis(xz, 1, 0),
            jnp.moveaxis(mask, 1, 0) if mask is not None else None,
        )
        if xs[1] is None:
            xs = (xs[0], jnp.ones((S, B), bool))
        _, hs = jax.lax.scan(cell, carry, xs, reverse=self.reverse)
        return jnp.moveaxis(hs, 0, 1)  # (B, S, H)


class LSTMQuestionEncoder(nn.Module):
    """Embedding + (bi)LSTM. Returns (token_states (B,S,D_out), mask)."""

    vocab_size: int
    embed_dim: int
    hidden: int
    bidirectional: bool = True
    policy: DTypePolicy = DTypePolicy()
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        token_ids: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        if mask is None:
            mask = token_ids > 0  # id 0 = PAD (data/vocab.py convention)
        emb = nn.Embed(
            self.vocab_size,
            self.embed_dim,
            name="word_embed",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(token_ids)
        emb = nn.Dropout(self.dropout)(emb, deterministic=not train)
        fwd = LSTMLayer(self.hidden, self.policy, name="fwd")(emb, mask)
        if self.bidirectional:
            bwd = LSTMLayer(self.hidden, self.policy, reverse=True, name="bwd")(
                emb, mask
            )
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
        return out, mask
