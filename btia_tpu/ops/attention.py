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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

# exp(x) = exp2(x·log2 e): folding this constant into the softmax scale
# (applied to q, once, over the small (rows, D) operand) turns the VPU
# transcendental into a bare exp2 and deletes the per-element score-tile
# multiply — the score tile is Sk/D ≈ 10× larger than q.
_LOG2E = 1.4426950408889634

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


def _attn_block_log2(q, k, v, bias_row, accum_dtype=jnp.float32, defer_div=True):
    """Slimmed softmax chain: q is pre-scaled by scale·log2(e) (caller),
    so scores live in the log2 domain — exp2 replaces exp and the score
    multiply vanishes. bias_row values are 0 / -1e9, valid in either
    domain; None skips the add entirely (unmasked, exact-fit keys).

    defer_div=True normalizes AFTER the PV matmul — dividing the (Sq, D)
    accumulator instead of the (Sq, Sk) probability tile shrinks the
    divide pass Sk/D ≈ 10×, but keeps an f32 accumulator alive per call;
    in a kernel that loops this block over many heads the accumulators
    stack in scoped VMEM (measured: 21.07M > the 16M limit for the
    16-head ViT-L bshd kernel at the exact-fit 584 q tile → compile
    failure), so multi-head-loop callers pass defer_div=False.
    """
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=accum_dtype,
    )
    if bias_row is not None:
        s = s + bias_row
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    if defer_div:
        acc = jnp.dot(e.astype(v.dtype), v, preferred_element_type=accum_dtype)
        return acc / denom
    p = (e / denom).astype(v.dtype)
    return jnp.dot(p, v, preferred_element_type=accum_dtype)


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, has_bias):
    o_ref[0, 0] = _attn_block_log2(
        q_ref[0, 0],
        k_ref[0, 0],
        v_ref[0, 0],
        bias_ref[0] if has_bias else None,
    ).astype(o_ref.dtype)


_BLOCK_Q = 256  # max Q-dim tile: bounds the (block_q, Sk) score tile in VMEM


def _pick_block_q(Sq: int) -> int:
    """Q tile minimizing padded rows (the kernel is VPU-softmax-bound, so
    wasted score rows cost linearly). Short seqs (≤ _BLOCK_Q) keep the
    round-2 rule — one exact-fit tile, zero padding. Longer seqs pick the
    pad-minimizing tile from {256, 128, 64}: 577-token ViT-L pads to 768
    under a fixed 256 tile but only 640 under 128 (profiled as
    bf16[16,768,1024] attn outputs, BENCH_NOTES r3). Ties prefer the
    larger tile — fewer grid programs reload K/V fewer times."""
    exact = _round_up(Sq, 8)
    if exact <= 640:
        return exact
    best = (_round_up(Sq, _BLOCK_Q), _BLOCK_Q)
    for cand in (128, 64):
        padded = _round_up(Sq, cand)
        if padded < best[0]:
            best = (padded, cand)
    return best[1]

# Long-seq (ViT) attention layout: True = the head-pad-free (B, S, H*D)
# kernel (_bshd_flash_pallas), False = transpose + per-(b,h) flash kernel.
# Measured on the serving step before flipping (BENCH_NOTES r3).
_BSHD_FLASH_LONG_SEQ = True


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
    block_q = _pick_block_q(Sq)
    Sqp = _round_up(Sq, block_q)
    Skp = _round_up(Sk, 128)  # Sk is the lane dim of the score tile

    # Prescale q by scale·log2(e): scores arrive in the log2 domain (see
    # _attn_block_log2). One elementwise pass over q, fused by XLA into
    # the pad — vs a multiply over the Sk/D ≈ 10× larger score tile.
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sqp - Sq), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skp - Sk), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skp - Sk), (0, Dp - D)))

    # The bias add over the (block_q, Skp) score tile is only needed when
    # a real mask exists or padded key columns must be suppressed.
    has_bias = kv_mask is not None or Skp != Sk
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), dtype=bool)
    maskp = jnp.pad(kv_mask, ((0, 0), (0, Skp - Sk)))
    bias = jnp.where(maskp, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    grid = (B, H, Sqp // block_q)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, has_bias=has_bias),
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


# ---------------------------------------------------------------------------
# Batch-blocked fan-out attention kernel (short sequences, huge batch)
# ---------------------------------------------------------------------------
#
# The serving fan-out [B:11] runs attention at shapes like
# (B=2048, H=12, Sq=32, Sk=32..82). XLA's einsum lowering materializes the
# f32 score tensor in HBM with quarter-full lane tiles (Sk=32 of 128 lanes)
# and surrounds it with head-layout copies — profiled at ~200 ms of a
# 437 ms serving step, where the true attention FLOPs justify ~10 ms.
#
# This kernel packs `bb` batch elements into ONE score matmul per head:
#   Q_cat (bb*Sq, D) @ K_catᵀ (D, bb*Sk) → scores (bb*Sq, bb*Sk)
# and masks the off-block-diagonal (cross-batch) entries multiplicatively
# after exp. That spends bb× the minimal FLOPs, but buys full MXU rows,
# a VMEM-resident softmax (no HBM score traffic at all), and a
# projection-native (B, S, H*D) layout with zero transpose copies. One
# grid program handles ALL heads of a batch block (~200 MFLOP/program), so
# per-program overhead — which sank the per-(b,h) kernel on these shapes
# (BENCH_NOTES round 1) — is amortized ~100×.


def _fanout_kernel(
    q_ref, k_ref, v_ref, cmask_ref, o_ref, *, num_heads, scale, bb
):
    g_bb, sq, hd = q_ref.shape
    g = g_bb // bb
    sk = k_ref.shape[1]
    d = hd // num_heads
    # Valid = same batch element AND unpadded key. cmask_ref comes in
    # pre-flattened to (1, g, bb*sk) f32 {0,1}; the block-diagonal part is
    # an iota compare (identical for every inner block — hoisted). The
    # mask is applied as a -1e9 additive bias BEFORE the row max:
    # shift-invariance of softmax holds mathematically for a post-mask
    # max, but not in finite precision — a huge invalid score (cross-batch
    # pair, garbage padded key) would push the shift so far that every
    # VALID exp(s-m) underflows to 0 and the row's output silently
    # collapses. Biasing first keeps the max over valid entries; masked
    # entries underflow to exact 0 in the exp, preserving the exact-zero
    # semantics the backward pass mirrors.
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (bb * sq, bb * sk), 0) // sq
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (bb * sq, bb * sk), 1) // sk
    diag = rows_b == cols_b
    for j in range(g):
        blk = slice(j * bb, (j + 1) * bb)
        # Fold the softmax scale AND log2(e) into q: one multiply over
        # (rows, D) instead of over the bb×-wider score tile; scores then
        # live in the log2 domain so the softmax uses bare exp2 (the
        # -1e9 mask bias is domain-agnostic).
        q = (q_ref[blk].astype(jnp.float32) * (scale * _LOG2E)).astype(
            q_ref.dtype
        )
        q = q.reshape(bb * sq, hd)
        k = k_ref[blk].reshape(bb * sk, hd)
        v = v_ref[blk].reshape(bb * sk, hd)
        mask = jnp.where(diag, cmask_ref[0, j], 0.0)
        neg_bias = (1.0 - mask) * 1e9
        # Per-head interleaved schedule. A phase-separated variant (all
        # score matmuls → one stacked softmax → all PV matmuls, to stop
        # MXU↔VPU ping-pong) measured equal-or-worse at every serving
        # shape (bert 2.90 vs 2.93, ad_head 6.83 vs 7.19 ms — BENCH_NOTES
        # r3 schedule sweep); Mosaic already overlaps the units fine.
        outs = []
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(
                q[:, sl],
                k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s - neg_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s - m) * mask
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            # Normalize AFTER the PV matmul: a (rows, D) divide replaces
            # a (rows, bb·Sk) divide — bb·Sk/D ≈ 2-5× less VPU work, and
            # exact zeros at masked keys are preserved (e itself is
            # masked).
            acc = jax.lax.dot_general(
                e.astype(v.dtype),
                v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((acc / denom).astype(o_ref.dtype))
        o_ref[blk] = jnp.concatenate(outs, axis=-1).reshape(bb, sq, hd)


# Batch blocks per grid program. Each grid step DMAs one (bb, S, H*D)
# q/k/v/out block and runs ~0.5 μs of MXU work — at serving shapes the
# grid is ~512 steps/site × 16 sites, so per-step pipeline overhead is a
# first-order cost. Processing _FANOUT_G blocks per program amortizes it
# (bigger DMAs, fewer steps) without changing the math or the bb packing.
# Swept on the v5e via attention_bench --fanout-sweep; VMEM bound: the
# in+out working set is g·bb·(Sq+2·Sk+Sq)·H*D·2B ×2 (double buffering),
# ≤ ~6 MB of the 16 MB/core at g=4 for every serving shape.
_FANOUT_G = 1

# 2× the packed-row target for bb selection (256 → bb·max(Sq,Sk) ≤ 128
# rows). Sweepable via attention_bench --fanout-sweep; 512 (256-row
# target) measured no faster in round 2.
_FANOUT_PACK = 256


def _fanout_pallas(q, k, v, colmask, num_heads: int, interpret: bool):
    """q: (B, Sq, H*D); k, v: (B, Sk, H*D); colmask: (B, Sk) f32 {0,1}."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // num_heads
    scale = 1.0 / (D**0.5)
    # Batch block: pack rows toward ~128 (one full MXU row-tile); packing
    # further doubles the inflated score FLOPs for little extra MXU
    # utilization (measured: 256-row target was no faster). Power of two
    # so B pads cheaply. _FANOUT_PACK is 2× the row target (sweepable).
    bb = 1
    while bb < 32 and 2 * bb * max(Sq, Sk) <= _FANOUT_PACK:
        bb *= 2
    g = max(1, min(_FANOUT_G, B // bb))
    Bp = _round_up(B, bb * g)
    if Bp != B:
        pad = ((0, Bp - B), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        colmask = jnp.pad(colmask, ((0, Bp - B), (0, 0)))
    cm = colmask.reshape(Bp // (bb * g), g, bb * Sk)

    out = pl.pallas_call(
        functools.partial(
            _fanout_kernel, num_heads=num_heads, scale=scale, bb=bb
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Sq, HD), q.dtype),
        grid=(Bp // (bb * g),),
        in_specs=[
            pl.BlockSpec(
                (bb * g, Sq, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bb * g, Sk, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bb * g, Sk, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g, bb * Sk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb * g, Sq, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * bb * num_heads * Sq * Sk * D,
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=Bp * bb * num_heads * Sq * Sk,
        ),
        interpret=interpret,
    )(q, k, v, cm)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fanout_mha(q, k, v, colmask, num_heads: int, interpret: bool):
    return _fanout_pallas(q, k, v, colmask, num_heads, interpret)


def _fanout_fwd(q, k, v, colmask, num_heads, interpret):
    out = _fanout_mha(q, k, v, colmask, num_heads, interpret)
    return out, (q, k, v, colmask)


def _fanout_bwd(num_heads, interpret, res, g):
    # XLA rematerialisation in the packed (B, S, H, D) layout — mirrors the
    # kernel's multiplicative-mask softmax so p (incl. exact zeros at
    # masked keys) matches the forward.
    q, k, v, colmask = res
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // num_heads
    scale = 1.0 / (D**0.5)
    q4 = q.reshape(B, Sq, num_heads, D)
    k4 = k.reshape(B, Sk, num_heads, D)
    v4 = v.reshape(B, Sk, num_heads, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4, preferred_element_type=jnp.float32)
    cm = colmask.astype(jnp.float32)[:, None, None, :]
    # Mask-bias BEFORE the max, mirroring the forward kernel (see
    # _fanout_kernel): a post-mask max is shift-invariant only in exact
    # arithmetic; a huge invalid score would underflow every valid term.
    s = s * scale - (1.0 - cm) * 1e9
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    e = e * cm
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    g4 = g.reshape(B, Sq, num_heads, D).astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g4)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g4, v4.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k4.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q4.astype(jnp.float32)) * scale
    return (
        dq.reshape(B, Sq, HD).astype(q.dtype),
        dk.reshape(B, Sk, HD).astype(k.dtype),
        dv.reshape(B, Sk, HD).astype(v.dtype),
        None,
    )


_fanout_mha.defvjp(_fanout_fwd, _fanout_bwd)


# The fan-out kernel wins only when the batch is large enough to amortize
# its grid and the sequences are short enough to pack; below this batch the
# XLA einsum path stays (e.g. training at batch 16-64 on CPU fixtures).
# Env-settable for the dedup-tower A/B [VERDICT r4 #4]: the dedup serving
# path encodes only U unique questions, so a template pool smaller than
# 64·dp runs its BERT tower unfused at the default floor.
_FANOUT_MIN_BATCH = int(os.environ.get("BTIA_FANOUT_MIN_BATCH", "64"))


# ---------------------------------------------------------------------------
# Head-pad-free flash attention in the projection-native (B, S, H*D) layout
# ---------------------------------------------------------------------------
#
# The per-(b,h) flash kernel above needs (B, H, S, Dh) inputs. For ViT-L
# (H=16, Dh=64) that costs, around every attention site: two transpose
# copies (BSHD→BHSD→BSHD) AND half-full lane tiles (Dh=64 of 128 lanes) on
# q/k/v/out in HBM — profiled together at ~17 ms (~5%) of the serving step
# (BENCH_NOTES "layout copies/pads"; VERDICT r2 next-round #4). This kernel
# keeps the packed (B, S, H*D) layout end-to-end: H*D = 1024 is 8 FULL lane
# tiles, no transpose exists anywhere, and one grid program computes ALL
# heads of a q-tile by slicing the lane dim per head (same technique as
# _fanout_kernel, which compiles efficiently at D=64 slices).


def _bshd_flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads, has_bias
):
    hd = q_ref.shape[2]
    d = hd // num_heads
    q = q_ref[0]  # pre-scaled by scale·log2(e) in the wrapper
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0] if has_bias else None  # (1, Skp) f32, -1e9 at masked
    outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        outs.append(
            _attn_block_log2(
                q[:, sl], k[:, sl], v[:, sl], bias, defer_div=False
            ).astype(o_ref.dtype)
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bshd_flash_pallas(q, k, v, kv_mask, num_heads: int, interpret: bool):
    """q: (B, Sq, H*D); k, v: (B, Sk, H*D); kv_mask: (B, Sk) True=valid."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // num_heads
    scale = 1.0 / (D**0.5)

    block_q = _pick_block_q(Sq)
    Sqp = _round_up(Sq, block_q)
    Skp = _round_up(Sk, 128)
    # Log2-domain prescale, fused into the pad (see _attn_block_log2).
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, Sqp - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Skp - Sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Skp - Sk), (0, 0)))
    has_bias = kv_mask is not None or Skp != Sk
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), dtype=bool)
    maskp = jnp.pad(kv_mask, ((0, 0), (0, Skp - Sk)))
    bias = jnp.where(maskp, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(
            _bshd_flash_kernel, num_heads=num_heads, has_bias=has_bias
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sqp, HD), q.dtype),
        grid=(B, Sqp // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Skp, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Skp, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Skp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * Sqp * Skp * D,
            bytes_accessed=(qp.size + kp.size + vp.size + B * Sqp * HD)
            * qp.dtype.itemsize,
            transcendentals=B * num_heads * Sqp * Skp,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out[:, :Sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bshd_mha(q, k, v, kv_mask, num_heads: int, interpret: bool):
    return _bshd_flash_pallas(q, k, v, kv_mask, num_heads, interpret)


def _bshd_fwd(q, k, v, kv_mask, num_heads, interpret):
    out = _bshd_mha(q, k, v, kv_mask, num_heads, interpret)
    return out, (q, k, v, kv_mask)


def _bshd_bwd(num_heads, interpret, res, g):
    # XLA rematerialisation (same policy as _mha_bwd) directly in the
    # packed layout; kv_mask is the standard additive-bias softmax mask.
    q, k, v, kv_mask = res
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // num_heads
    scale = 1.0 / (D**0.5)
    q4 = q.reshape(B, Sq, num_heads, D)
    k4 = k.reshape(B, Sk, num_heads, D)
    v4 = v.reshape(B, Sk, num_heads, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4, preferred_element_type=jnp.float32)
    s = s * scale
    if kv_mask is not None:
        s = s + jnp.where(kv_mask, 0.0, _NEG_INF).astype(jnp.float32)[
            :, None, None, :
        ]
    p = jax.nn.softmax(s, axis=-1)
    g4 = g.reshape(B, Sq, num_heads, D).astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g4)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g4, v4.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k4.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q4.astype(jnp.float32)) * scale
    return (
        dq.reshape(B, Sq, HD).astype(q.dtype),
        dk.reshape(B, Sk, HD).astype(k.dtype),
        dv.reshape(B, Sk, HD).astype(v.dtype),
        None,
    )


_bshd_mha.defvjp(_bshd_fwd, _bshd_bwd)

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

    Three paths, all measured (BENCH_NOTES.md):
      * long sequences (score tile > _SMALL_SCORE_TILE): the per-(b,h)
        flash kernel; its transposes are amortized at those sizes.
      * short sequences with a serving-scale batch (≥ _FANOUT_MIN_BATCH)
        on TPU: the batch-blocked fan-out kernel — VMEM-resident softmax,
        no head copies, no HBM score traffic.
      * otherwise: XLA einsum keeping H as an interior batch dim so the
        layout change folds into the matmul.
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    on_tpu = _resolved_impl() == "pallas"
    if on_tpu and Sq * Sk > _SMALL_SCORE_TILE:
        if _BSHD_FLASH_LONG_SEQ and D % 64 == 0 and (H * D) % 128 == 0:
            # Head-pad-free path: stays in (B, S, H*D) — no transpose
            # copies, full lane tiles (see _bshd_flash_pallas).
            out = _bshd_mha(
                q.reshape(B, Sq, H * D),
                k.reshape(B, Sk, H * D),
                v.reshape(B, Sk, H * D),
                kv_mask,
                H,
                interpret,
            )
            return out.reshape(B, Sq, H, D)
        t = lambda x: x.transpose(0, 2, 1, 3)
        return t(_mha(t(q), t(k), t(v), kv_mask, True, interpret))
    if on_tpu and B >= _FANOUT_MIN_BATCH and D % 64 == 0:
        cm = (
            kv_mask.astype(jnp.float32)
            if kv_mask is not None
            else jnp.ones((B, Sk), jnp.float32)
        )
        out = _fanout_mha(
            q.reshape(B, Sq, H * D),
            k.reshape(B, Sk, H * D),
            v.reshape(B, Sk, H * D),
            cm,
            H,
            interpret,
        )
        return out.reshape(B, Sq, H, D)

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
