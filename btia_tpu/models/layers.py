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


class DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: same scope tree
    ({kernel, bias}), same initializers — so checkpoints, the torch
    converter name map, and the TP sharding regexes are unchanged — but
    the kernel/bias arrays are returned raw, which lets the caller feed
    them into the fused projection+attention Pallas kernel
    (ops.fused_attn) instead of a standalone matmul."""

    features: int
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_dim, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    """Parameter-only stand-in for the LayerNorm module: same scope tree
    ({scale, bias}), same initializers — checkpoints, the torch converter
    name map, and sharding rules are unchanged — but returns the raw
    (scale, bias, eps) triple so the caller can fold the normalization
    into a fused attention kernel's prologue/epilogue (ops.fused_attn
    SiteCfg) instead of a standalone HBM round trip."""

    param_dtype: jnp.dtype
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param(
            "scale", nn.initializers.ones, (dim,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (dim,), self.param_dtype
        )
        return scale, bias, self.epsilon


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention over (B, S, D) token streams.

    Runs through ops.fused_attn.fused_dense_attention: on the
    short-sequence serving path ONE Pallas kernel computes q/k/v
    projections, attention, and the output projection with the weights
    VMEM-resident (the per-site HBM traffic and custom-call layout
    bridges were the two dominant non-roofline buckets, BENCH_NOTES r3);
    everywhere else it is plain XLA projections + ops.mha_bshd.

    The q_ln/kv_ln/residual/post_ln site arguments fold the surrounding
    block's LayerNorms and residual add into the kernel (SiteCfg) —
    callers own those params (LayerNormParams) and pass them through.
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
        q_ln=None,
        kv_ln=None,
        residual: bool = False,
        post_ln=None,
    ) -> jax.Array:
        from btia_tpu.ops.fused_attn import fused_dense_attention

        x_kv = x_q if x_kv is None else x_kv
        pd = self.policy.param_dtype
        cd = self.policy.compute_dtype
        din = x_q.shape[-1]
        wq, bq = DenseParams(self.dim, pd, name="q_proj")(din)
        wk, bk = DenseParams(self.dim, pd, name="k_proj")(x_kv.shape[-1])
        wv, bv = DenseParams(self.dim, pd, name="v_proj")(x_kv.shape[-1])
        wo, bo = DenseParams(self.out_dim or self.dim, pd, name="o_proj")(
            self.dim
        )
        return fused_dense_attention(
            x_q.astype(cd),
            x_kv.astype(cd),
            kv_mask,
            wq, bq, wk, bk, wv, bv, wo, bo,
            self.num_heads,
            q_ln=q_ln,
            kv_ln=kv_ln,
            residual=residual,
            post_ln=post_ln,
        )


class QuantizableDense(nn.Module):
    """Dense whose param tree matches nn.Dense ({kernel, bias}) but which
    can route through the fused-epilogue int8 Pallas matmul (ops/quant.py)
    at serving time. The fp path reproduces nn.Dense exactly (parity)."""

    features: int
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        int8: bool = False,
        act: Optional[Callable] = None,
    ) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.policy.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.policy.param_dtype,
        )
        cd = self.policy.compute_dtype
        if int8:
            from btia_tpu.ops.quant import int8_matmul_fused, quantize_weight

            # KNOWN COST (acceptable while int8_ffn stays off — measured
            # negative end-to-end, BENCH_NOTES): quantize_weight runs
            # inside the jitted forward, so serving re-reads the fp32
            # kernel from HBM every step. If int8 ever wins, pre-quantize
            # at weight-load time and feed w_i8/w_scale as variables.
            w_i8, w_scale = quantize_weight(kernel)
            y = int8_matmul_fused(
                x.reshape(-1, x.shape[-1]).astype(cd),
                w_i8,
                w_scale,
                bias.astype(jnp.float32),
                act=act,
                out_dtype=cd,
            )
            return y.reshape(*x.shape[:-1], self.features)
        # Flatten tokens to 2D rows: XLA tiles a (B*N, D) matmul onto the
        # MXU at ~177 TF/s, while the 3D form with a non-multiple-of-8
        # token dim (e.g. 50 BTIA image tokens) lowered to a ~70 TF/s
        # generic fusion (profiled, BENCH_NOTES round 2).
        x2 = x.reshape(-1, x.shape[-1]).astype(cd)
        y = jnp.dot(x2, kernel.astype(cd)) + bias.astype(cd)
        if act is not None:
            y = act(y)
        return y.reshape(*x.shape[:-1], self.features)


class Mlp(nn.Module):
    """Transformer MLP: fc1 → act → fc2 (column/row TP-shardable).

    Under policy.int8 (serving only, deterministic), both matmuls run
    through the fused int8 kernel with the GELU fused into fc1's epilogue."""

    dim: int
    hidden_dim: int
    policy: DTypePolicy = DTypePolicy()
    # None → policy-selected GELU flavor (resolved in __call__):
    #   fp32 policy: exact erf — the torchvision/timm/HF convention, so
    #     converted PyTorch checkpoints agree at the 1e-4 logit level
    #     [SURVEY §7.3]; this is the parity rail.
    #   bf16 policy: tanh approximation — the erf epilogue throttles the
    #     fused fc1→gelu→fc2 chain to 81/69 TF/s at the two dominant
    #     serving shapes where tanh runs at the no-activation bound
    #     (105/86 TF/s; gelu microbench, BENCH_NOTES r3). Max
    #     |erf−tanh| ≈ 3e-3 sits below bf16's own rounding step
    #     (eps ≈ 8e-3), so the bf16 path loses no representable accuracy.
    act: Callable | None = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        act = self.act
        if act is None:
            exact = self.policy.compute_dtype == jnp.float32
            act = functools.partial(nn.gelu, approximate=not exact)
        fc1 = QuantizableDense(self.hidden_dim, self.policy, name="fc1")
        fc2 = QuantizableDense(self.dim, self.policy, name="fc2")
        if self.policy.int8 and deterministic:
            # tanh-approx GELU in the kernel epilogue: Mosaic has no erf
            # lowering, and the ~1e-3 tanh-vs-erf difference is far below
            # the int8 PTQ noise this path already accepts.
            act = functools.partial(nn.gelu, approximate=True)
            return fc2(fc1(x, int8=True, act=act), int8=True)
        # With both matmuls flattened to 2D rows, XLA output-fuses
        # fc1→gelu→fc2 into a single op. Forcing them apart with an
        # optimization_barrier was measured SLOWER end-to-end (431 vs
        # 338 ms/step, BENCH_NOTES r2) despite higher per-matmul TF/s —
        # the fused op's skipped HBM round trip and better overlap win.
        x = act(fc1(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return fc2(x)


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
