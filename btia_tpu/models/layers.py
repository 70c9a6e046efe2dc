"""Shared Flax building blocks (attention, MLP) with the TPU dtype policy.

Module names matter: ``q_proj``/``k_proj``/``v_proj``/``o_proj`` and
``fc1``/``fc2`` are the anchors the TP sharding rules key on
(btia_tpu/parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.core.dtypes import DTypePolicy
from btia_tpu.ops.attention import mha, mha_bshd
from btia_tpu.ops.norms import layernorm


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, S, D) → (B, H, S, D/H)."""
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, S, Dh) → (B, S, H*Dh)."""
    B, H, S, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)


def heads_bshd(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, S, D) → (B, S, H, D/H) — reshape only, no transpose copy."""
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention over (B, S, D) token streams.

    The softmax(QKᵀ)V core runs through ops.mha_bshd: XLA einsum for
    short sequences (no head-transpose copies), the fused Pallas kernel
    for long ones [B:5].
    """

    dim: int
    num_heads: int
    policy: DTypePolicy = DTypePolicy()
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x_q: jax.Array,
        x_kv: Optional[jax.Array] = None,
        kv_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        x_kv = x_q if x_kv is None else x_kv
        dense = lambda name: nn.Dense(
            self.dim,
            name=name,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        B, Sq, _ = x_q.shape
        q = heads_bshd(dense("q_proj")(x_q), self.num_heads)
        k = heads_bshd(dense("k_proj")(x_kv), self.num_heads)
        v = heads_bshd(dense("v_proj")(x_kv), self.num_heads)
        out = mha_bshd(q, k, v, kv_mask).reshape(B, Sq, -1)
        return nn.Dense(
            self.out_dim or self.dim,
            name="o_proj",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(out)


class Mlp(nn.Module):
    """Transformer MLP: fc1 → act → fc2 (column/row TP-shardable)."""

    dim: int
    hidden_dim: int
    policy: DTypePolicy = DTypePolicy()
    # exact (erf) GELU — the torchvision/timm/HF convention, so converted
    # PyTorch checkpoints agree at the 1e-4 logit level [SURVEY §7.3].
    act: Callable = functools.partial(nn.gelu, approximate=False)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(
            self.hidden_dim,
            name="fc1",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(
            self.dim,
            name="fc2",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm: exact fp32 math under the fp32 policy (parity path),
    MXU-statistics + bf16 elementwise under bf16 (ops/norms.py — the
    convert_reduce fusions were ~30% of the serving step)."""

    policy: DTypePolicy = DTypePolicy()
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), self.policy.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (x.shape[-1],), self.policy.param_dtype
        )
        fast = self.policy.compute_dtype == jnp.bfloat16
        return layernorm(x, scale, bias, self.epsilon, fast=fast).astype(
            self.policy.compute_dtype
        )


def masked_mean(x: jax.Array, mask: Optional[jax.Array], axis: int = 1) -> jax.Array:
    """Mean over tokens, ignoring padding. x: (B, S, D), mask: (B, S)."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = mask.astype(x.dtype)[..., None]
    denom = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return jnp.sum(x * m, axis=axis) / denom
