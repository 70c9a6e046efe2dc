"""Fused dense-projection + attention + output-projection Pallas kernel.

Serving-path profile (BENCH_NOTES r3): at the fan-out shapes
(B = B_img·Q ≈ 2048, Sq/Sk ≤ 82) the attention custom-calls are
DMA-bound — q/k/v/out streams move ~400 MB/call at ~276 GB/s effective
(~3× below HBM peak) — and XLA inserts layout-bridge copies at every
custom-call boundary ({2,0,1} vs {2,1,0} minor-to-major, measured ~27
ms/step, unfixable from JAX; see the 2D-flattening negative result).

This kernel removes both costs structurally: ONE pallas_call reads the
token stream x (B, S, Din) once, computes q/k/v projections on-chip
(weights stay resident in VMEM across the whole grid), runs the
batch-blocked block-diagonal attention of ops.attention._fanout_kernel,
applies the output projection, and writes the projected result once.
Per-site HBM traffic drops from ~5 tensors of (B, S, D) to 2, and all
custom-call layout boundaries for q/k/v/attn-out disappear.

Used by models.layers.MultiHeadAttention on the short-sequence
serving path; the unfused road (separate Dense matmuls + ops.mha_bshd)
remains the always-correct fallback and the backward pass (the vjp
recomputes through the unfused XLA graph — same rematerialisation
policy as ops.attention).

[B:5 "rewritten as fused Pallas attention kernels"; B:11 fan-out serving.]
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import contextlib

from btia_tpu.ops.attention import (
    _FANOUT_MIN_BATCH,
    _FANOUT_PACK,
    _LOG2E,
    _SMALL_SCORE_TILE,
    _resolved_impl,
    _round_up,
    mha_bshd,
)

# The fused kernels are measured and equivalence-tested on the
# single-device serving path. Under bare pjit with TP-sharded weights,
# XLA's SPMD partitioning of the custom call is UNSAFE (it replicates /
# gathers operands) — so mesh programs must trace inside fused_mesh(),
# which wraps every fused call in an explicit shard_map (batch over
# 'data', heads over 'model', per-rank output-projection partials
# psum'd over 'model') so the partitioning is manual and safe by
# construction. disable_fused() keeps the fully-unfused road available.
_ENABLED = True
_MESH = None  # set by fused_mesh(); routes fused calls through shard_map

# A/B knobs (VERDICT r3 #7; measured on device, see BENCH_NOTES r4):
# grid programs are independent across batch blocks, so 'parallel' is
# semantically valid — whether it beats 'arbitrary' is an empirical
# Mosaic-scheduling question. Env-settable so bench.py can A/B the FULL
# serving step (standalone-site deltas at these sizes sit inside the
# run-to-run band).
# Serving-step A/B (2026-08-18, BENCH_NOTES r4): 'parallel' measured
# inconsistent medians (8,788–9,017 vs default 8,755) — stays arbitrary.
_DIM_SEMANTICS = _os.environ.get("BTIA_FUSED_DIM_SEMANTICS", "arbitrary")
# Static-q head kernel batch packing: bb=2 stacks two batch elements'
# answer-query rows into one block-diagonal program (rows 64→128 = one
# full MXU sublane tile; k/v projection rows 82→164) at 2× score FLOPs.
# Measured at the FULL serving step: 9,063–9,068 pairs/s vs 8,755 at
# bb=1 (+3.5%, two tight-band runs) — the default. bb=4 and the
# 'parallel'+bb2 combination measured no better than bb2 alone.
_STATICQ_BB = int(_os.environ.get("BTIA_STATICQ_BB", "2"))


@contextlib.contextmanager
def disable_fused():
    """Route fused_dense_attention/fused_static_q_attention through the
    unfused path for everything traced inside this context — including
    interpret-capable shapes (this context is authoritative)."""
    global _ENABLED
    old = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = old


@contextlib.contextmanager
def fused_mesh(mesh):
    """Trace fused attention under an explicit device mesh.

    Inside this context, fused_dense_attention/fused_static_q_attention
    wrap their Pallas custom calls in jax.shard_map over `mesh`: the
    batch partitions over 'data' (safe by construction — the kernel grid
    is batch-blocked), attention heads + q/k/v projection columns
    partition over 'model', and the row-sharded output projection's
    partial results are psum'd over 'model' (Megatron-style TP). Sites
    whose per-shard shapes fail the fused gates take the unfused XLA
    road, which pjit partitions natively. `mesh=None` or a 1-device mesh
    is a no-op (plain single-device routing)."""
    global _MESH
    old = _MESH
    _MESH = mesh if (mesh is not None and mesh.size > 1) else None
    try:
        yield
    finally:
        _MESH = old


def _mesh_axes(mesh):
    """(dp, tp) axis sizes of the ('data','model') mesh, or (1, 1)."""
    if mesh is None:
        return 1, 1
    return mesh.shape["data"], mesh.shape["model"]


def _fused_kernel(
    xq_ref,
    xkv_ref,
    cmask_ref,
    wq_ref,
    wk_ref,
    wv_ref,
    wo_ref,
    bq_ref,
    bk_ref,
    bv_ref,
    bo_ref,
    o_ref,
    *,
    num_heads,
    bb,
    sq,
    sk,
):
    hd = wq_ref.shape[1]
    d = hd // num_heads
    cd = xq_ref.dtype

    xq = xq_ref[...].reshape(bb * sq, xq_ref.shape[2])
    xkv = xkv_ref[...].reshape(bb * sk, xkv_ref.shape[2])

    # On-chip projections (weights VMEM-resident across the grid). The
    # softmax scale·log2(e) is folded into wq/bq by the wrapper, so the
    # attention below runs the log2-domain softmax of _fanout_kernel.
    def proj(x, w_ref, b_ref):
        y = jax.lax.dot_general(
            x,
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b_ref[...]).astype(cd)

    q = proj(xq, wq_ref, bq_ref)
    k = proj(xkv, wk_ref, bk_ref)
    v = proj(xkv, wv_ref, bv_ref)

    # Batch-blocked block-diagonal attention (see ops.attention
    # _fanout_kernel for the masking/numerics rationale).
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (bb * sq, bb * sk), 0) // sq
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (bb * sq, bb * sk), 1) // sk
    mask = jnp.where(rows_b == cols_b, cmask_ref[0, 0], 0.0)
    neg_bias = (1.0 - mask) * 1e9
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
        acc = jax.lax.dot_general(
            e.astype(cd),
            v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / denom).astype(cd))
    attn = jnp.concatenate(outs, axis=-1)

    out = jax.lax.dot_general(
        attn,
        wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (out + bo_ref[...]).astype(o_ref.dtype)
    o_ref[...] = out.reshape(bb, sq, wo_ref.shape[1])


def _fused_pallas(
    x_q, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret
):
    B, Sq, Din = x_q.shape
    Sk = x_kv.shape[1]
    HD = wq.shape[1]
    Dout = wo.shape[1]
    D = HD // num_heads
    scale = 1.0 / (D**0.5)
    cd = x_q.dtype

    # Fold scale·log2(e) into the q projection — zero per-token cost.
    c = jnp.float32(scale * _LOG2E)
    wq = (wq.astype(jnp.float32) * c).astype(cd)
    bq = bq.astype(jnp.float32) * c
    wk, wv, wo = (w.astype(cd) for w in (wk, wv, wo))
    bk, bv, bo = (b.astype(jnp.float32) for b in (bk, bv, bo))
    b2 = lambda b: b.reshape(1, -1)

    bb = 1
    while bb < 32 and 2 * bb * max(Sq, Sk) <= _FANOUT_PACK:
        bb *= 2
    Bp = _round_up(B, bb)
    if Bp != B:
        x_q = jnp.pad(x_q, ((0, Bp - B), (0, 0), (0, 0)))
        x_kv = jnp.pad(x_kv, ((0, Bp - B), (0, 0), (0, 0)))
        colmask = jnp.pad(colmask, ((0, Bp - B), (0, 0)))
    cm = colmask.reshape(Bp // bb, 1, bb * Sk)

    wspec = lambda w: pl.BlockSpec(
        w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, num_heads=num_heads, bb=bb, sq=Sq, sk=Sk
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Sq, Dout), cd),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, Sq, Din), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bb, Sk, Din), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, bb * Sk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [wspec(w) for w in (wq, wk, wv, wo)]
        + [wspec(b2(b)) for b in (bq, bk, bv, bo)],
        out_specs=pl.BlockSpec(
            (bb, Sq, Dout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_DIM_SEMANTICS,),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * (Sq + 2 * Sk) * Din * HD  # qkv projections
            + 2 * Bp * Sq * HD * Dout  # out projection
            + 4 * Bp * bb * num_heads * Sq * Sk * D,  # attention
            bytes_accessed=(x_q.size + x_kv.size + Bp * Sq * Dout)
            * x_q.dtype.itemsize,
            transcendentals=Bp * bb * num_heads * Sq * Sk,
        ),
        interpret=interpret,
    )(x_q, x_kv, cm, wq, wk, wv, wo, b2(bq), b2(bk), b2(bv), b2(bo))
    return out[:B]


def _unfused(x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads):
    """Reference path: plain XLA projections + ops.mha_bshd — numerically
    the module's historical behavior; also the vjp rematerialisation."""
    cd = x_q.dtype
    B, Sq, _ = x_q.shape
    Sk = x_kv.shape[1]
    HD = wq.shape[1]
    # Mirror nn.Dense exactly (3D dot_general on the last dim, bias add in
    # compute dtype) — this path must reproduce the module's historical
    # XLA lowering bit-for-bit (parity goldens; ViT-L layout stability).
    dense = lambda x, w, b: (
        jax.lax.dot_general(
            x, w.astype(cd), (((x.ndim - 1,), (0,)), ((), ()))
        )
        + b.astype(cd)
    )
    q = dense(x_q, wq, bq).reshape(B, Sq, num_heads, HD // num_heads)
    k = dense(x_kv, wk, bk).reshape(B, Sk, num_heads, HD // num_heads)
    v = dense(x_kv, wv, bv).reshape(B, Sk, num_heads, HD // num_heads)
    out = mha_bshd(q, k, v, kv_mask).reshape(B, Sq, HD)
    return dense(out, wo, bo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _fused(x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret):
    colmask = (
        kv_mask.astype(jnp.float32)
        if kv_mask is not None
        else jnp.ones(x_kv.shape[:2], jnp.float32)
    )
    return _fused_pallas(
        x_q, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret
    )


def _fused_fwd(x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, nh, interp):
    out = _fused(x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, nh, interp)
    return out, (x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _fused_bwd(nh, interp, res, g):
    x_q, x_kv, kv_mask, *params = res
    f = lambda xq, xkv, *p: _unfused(xq, xkv, kv_mask, *p, num_heads=nh)
    _, vjp = jax.vjp(f, x_q, x_kv, *params)
    grads = vjp(g)
    return (grads[0], grads[1], None) + tuple(grads[2:])


_fused.defvjp(_fused_fwd, _fused_bwd)


def _fused_over_mesh(
    x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
    interpret, mesh, tp,
):
    """The fused kernel under an explicit shard_map partitioning:
    batch over 'data', heads (q/k/v projection columns) over 'model',
    output projection rows over 'model' with a psum of the partials.
    Each shard runs the proven single-device custom_vjp; pjit never sees
    an unpartitioned custom call (the round-3 multi-chip hazard)."""
    from jax.sharding import PartitionSpec as P

    colmask = (
        kv_mask.astype(jnp.float32)
        if kv_mask is not None
        else jnp.ones(x_kv.shape[:2], jnp.float32)
    )
    nh_shard = num_heads // tp

    def per_shard(xq, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_):
        out = _fused(
            xq, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
            nh_shard, interpret,
        )
        if tp > 1:
            out = jax.lax.psum(out, "model")
        return out

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P("data"), P("data"), P("data"),
            P(None, "model"), P("model"),
            P(None, "model"), P("model"),
            P(None, "model"), P("model"),
            P("model", None), P(None),
        ),
        out_specs=P("data"),
        check_vma=False,  # custom_vjp inside defeats replication inference
    )
    # Each rank adds its bias share; the 'model' psum reassembles bo.
    return fn(
        x_q, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo,
        (bo.astype(jnp.float32) / tp).astype(bo.dtype),
    )


def _staticq_kernel(
    xkv_ref,
    cmask_ref,
    q2_ref,
    wk_ref,
    wv_ref,
    wo_ref,
    bk_ref,
    bv_ref,
    bo_ref,
    o_ref,
    *,
    num_heads,
    bb,
    nq,
    sk,
):
    cd = xkv_ref.dtype
    hd = q2_ref.shape[1]
    d = hd // num_heads
    xkv = xkv_ref[...].reshape(bb * sk, xkv_ref.shape[2])

    def proj(x, w_ref, b_ref):
        y = jax.lax.dot_general(
            x,
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b_ref[...]).astype(cd)

    k = proj(xkv, wk_ref, bk_ref)
    v = proj(xkv, wv_ref, bv_ref)
    # (K, HD) pre-projected + log2-prescaled, VMEM-resident. bb > 1
    # stacks the SAME query table per packed batch element: the score
    # matmul widens to (bb·K, bb·Sk) block-diagonal (full MXU rows at 2×
    # score FLOPs — the _fanout_kernel trade).
    q = q2_ref[...]
    if bb > 1:
        q = jnp.concatenate([q] * bb, axis=0)
    cmask = cmask_ref[0, 0]  # (bb·Sk,)
    if bb > 1:
        rows_b = (
            jax.lax.broadcasted_iota(jnp.int32, (bb * nq, bb * sk), 0) // nq
        )
        cols_b = (
            jax.lax.broadcasted_iota(jnp.int32, (bb * nq, bb * sk), 1) // sk
        )
        mask = jnp.where(rows_b == cols_b, cmask, 0.0)
    else:
        mask = cmask.reshape(1, sk)
    neg_bias = (1.0 - mask) * 1e9
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
        acc = jax.lax.dot_general(
            e.astype(cd),
            v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / denom).astype(cd))
    attn = jnp.concatenate(outs, axis=-1)
    out = jax.lax.dot_general(
        attn,
        wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (out + bo_ref[...]).astype(o_ref.dtype)
    o_ref[...] = out.reshape(bb, nq, wo_ref.shape[1])


def _staticq_pallas(
    queries, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret
):
    B, Sk, Din = x_kv.shape
    K = queries.shape[0]
    HD = wq.shape[1]
    Dout = wo.shape[1]
    D = HD // num_heads
    cd = x_kv.dtype

    # Project the batch-invariant queries ONCE (outside the grid), fold in
    # the softmax scale·log2(e), and keep the result VMEM-resident — the
    # unfused path pays a (B, K, Din) broadcast projection every step.
    c = jnp.float32((1.0 / D**0.5) * _LOG2E)
    q2 = (
        (
            jnp.dot(
                queries.astype(jnp.float32),
                wq.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            + bq.astype(jnp.float32)
        )
        * c
    ).astype(cd)
    wk, wv, wo = (w.astype(cd) for w in (wk, wv, wo))
    bk, bv, bo = (b.astype(jnp.float32).reshape(1, -1) for b in (bk, bv, bo))

    bb = _STATICQ_BB
    Bp = _round_up(B, bb)
    if Bp != B:
        x_kv = jnp.pad(x_kv, ((0, Bp - B), (0, 0), (0, 0)))
        colmask = jnp.pad(colmask, ((0, Bp - B), (0, 0)))
    cm = colmask.reshape(Bp // bb, 1, bb * Sk)

    wspec = lambda w: pl.BlockSpec(
        w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _staticq_kernel, num_heads=num_heads, bb=bb, nq=K, sk=Sk
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, K, Dout), cd),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, Sk, Din), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, bb * Sk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [wspec(w) for w in (q2, wk, wv, wo, bk, bv, bo)],
        out_specs=pl.BlockSpec(
            (bb, K, Dout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_DIM_SEMANTICS,),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Sk * Din * 2 * HD
            + 2 * Bp * K * HD * Dout
            + 4 * Bp * bb * num_heads * K * Sk * D,
            bytes_accessed=(x_kv.size + Bp * K * Dout) * x_kv.dtype.itemsize,
            transcendentals=Bp * bb * num_heads * K * Sk,
        ),
        interpret=interpret,
    )(x_kv, cm, q2, wk, wv, wo, bk, bv, bo)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _staticq(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret
):
    colmask = (
        kv_mask.astype(jnp.float32)
        if kv_mask is not None
        else jnp.ones(x_kv.shape[:2], jnp.float32)
    )
    return _staticq_pallas(
        queries, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads, interpret,
    )


def _staticq_unfused(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
):
    B = x_kv.shape[0]
    K = queries.shape[0]
    q_tokens = jnp.broadcast_to(
        queries[None].astype(x_kv.dtype), (B, K, queries.shape[1])
    )
    return _unfused(
        q_tokens, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
    )


def _staticq_fwd(queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, nh, it):
    out = _staticq(queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, nh, it)
    return out, (queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _staticq_bwd(nh, it, res, g):
    queries, x_kv, kv_mask, *params = res
    f = lambda qs, xkv, *p: _staticq_unfused(qs, xkv, kv_mask, *p, num_heads=nh)
    _, vjp = jax.vjp(f, queries, x_kv, *params)
    grads = vjp(g)
    return (grads[0], grads[1], None) + tuple(grads[2:])


_staticq.defvjp(_staticq_fwd, _staticq_bwd)


def _staticq_over_mesh(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
    interpret, mesh, tp,
):
    """fused_static_q_attention under shard_map (see _fused_over_mesh):
    the batch-invariant query table replicates; everything else follows
    the same data/model partitioning."""
    from jax.sharding import PartitionSpec as P

    colmask = (
        kv_mask.astype(jnp.float32)
        if kv_mask is not None
        else jnp.ones(x_kv.shape[:2], jnp.float32)
    )
    nh_shard = num_heads // tp

    def per_shard(qs, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_):
        out = _staticq(
            qs, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
            nh_shard, interpret,
        )
        if tp > 1:
            out = jax.lax.psum(out, "model")
        return out

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(None), P("data"), P("data"),
            P(None, "model"), P("model"),
            P(None, "model"), P("model"),
            P(None, "model"), P("model"),
            P("model", None), P(None),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(
        queries, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo,
        (bo.astype(jnp.float32) / tp).astype(bo.dtype),
    )


def fused_static_q_attention(
    queries: jax.Array,
    x_kv: jax.Array,
    kv_mask: Optional[jax.Array],
    wq: jax.Array,
    bq: jax.Array,
    wk: jax.Array,
    bk: jax.Array,
    wv: jax.Array,
    bv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Attention whose queries are a batch-invariant (K, Din) table — the
    AD answer head's answer-query attention [B:5, B:10]. On the fused
    path the query projection happens once (not per batch row) and k/v/o
    projections fuse into the kernel; otherwise the queries broadcast
    through the plain unfused road (the historical lowering)."""
    B, Sk, _ = x_kv.shape
    K = queries.shape[0]
    HD = wq.shape[1]
    D = HD // num_heads
    mesh = _MESH
    dp, tp = _mesh_axes(mesh)
    # Under a mesh, the shard decomposition itself must be exact:
    shardable = B % dp == 0 and num_heads % tp == 0
    # Hardware gates evaluate PER-SHARD shapes (HD/tp lanes per rank).
    gates = (
        _resolved_impl() == "pallas"
        and B // dp >= _FANOUT_MIN_BATCH
        and K * Sk <= _SMALL_SCORE_TILE
        and D % 64 == 0
        and wq.shape[0] % 128 == 0
        and wk.shape[0] % 128 == 0  # kv stream's own feature dim (ADVICE r3)
        and (HD // tp) % 128 == 0
        and wo.shape[1] % 128 == 0
    )
    # disable_fused() is authoritative even over interpret=True requests.
    use_fused = _ENABLED and shardable and (interpret or gates)
    if not use_fused:
        return _staticq_unfused(
            queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
        )
    if mesh is None:
        return _staticq(
            queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
            num_heads, interpret,
        )
    return _staticq_over_mesh(
        queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads, interpret, mesh, tp,
    )


def fused_dense_attention(
    x_q: jax.Array,
    x_kv: jax.Array,
    kv_mask: Optional[jax.Array],
    wq: jax.Array,
    bq: jax.Array,
    wk: jax.Array,
    bk: jax.Array,
    wv: jax.Array,
    bv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """q/k/v projection → MHA → output projection, fused where it wins.

    x_q: (B, Sq, Din); x_kv: (B, Sk, Din); kv_mask: (B, Sk) True=valid.
    Routing mirrors ops.mha_bshd: the fused Pallas kernel on TPU for
    short sequences at serving batch sizes; plain XLA otherwise.
    """
    B, Sq, _ = x_q.shape
    Sk = x_kv.shape[1]
    HD = wq.shape[1]
    D = HD // num_heads
    mesh = _MESH
    dp, tp = _mesh_axes(mesh)
    # Under a mesh, the shard decomposition itself must be exact:
    shardable = B % dp == 0 and num_heads % tp == 0
    # Hardware gates evaluate PER-SHARD shapes (HD/tp lanes per rank).
    gates = (
        _resolved_impl() == "pallas"
        and B // dp >= _FANOUT_MIN_BATCH
        and Sq * Sk <= _SMALL_SCORE_TILE
        and D % 64 == 0
        and wq.shape[0] % 128 == 0
        and wk.shape[0] % 128 == 0  # kv stream's own feature dim (ADVICE r3)
        and (HD // tp) % 128 == 0
        and wo.shape[1] % 128 == 0
    )
    # disable_fused() is authoritative even over interpret=True requests.
    use_fused = _ENABLED and shardable and (interpret or gates)
    if not use_fused:
        return _unfused(
            x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
        )
    if mesh is None:
        return _fused(
            x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
            num_heads, interpret,
        )
    return _fused_over_mesh(
        x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads, interpret, mesh, tp,
    )
