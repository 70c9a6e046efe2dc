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
from typing import NamedTuple, Optional, Tuple

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
from btia_tpu.ops.norms import layernorm


class SiteCfg(NamedTuple):
    """Static per-site fusion config: which LayerNorms / residual adds of
    the surrounding transformer block fold INTO the fused kernel.

    XLA cannot epilogue-fuse across a custom-call boundary, so every
    pre-LN materialization and residual add around the fused attention
    kernels costs full HBM round trips of the (B, S, D) stream (the
    ~25 ms/step "residual adds/LN" bucket in the canonical serving
    profile, BENCH_NOTES r3). With the raw stream already VMEM-resident
    inside the kernel, prologue LN (BTIA's pre-LN, the AD head's kv LN)
    and epilogue residual+LN (BERT's post-LN, BTIA/AD-head residuals)
    are free of extra traffic. eps == 0.0 disables a stage."""

    q_ln_eps: float = 0.0  # pre-LN on the query stream (BTIA)
    kv_ln_eps: float = 0.0  # pre-LN on the kv stream (BTIA, AD head)
    residual: bool = False  # out += raw x_q (or raw queries, static-q)
    post_ln_eps: float = 0.0  # out = LN(out) epilogue (BERT post-LN)

    def prologue_only(self) -> "SiteCfg":
        """Strip the epilogue — required when the kernel emits PARTIAL
        output-projection products (mesh TP) that are psum'd outside."""
        return self._replace(residual=False, post_ln_eps=0.0)


_PLAIN_SITE = SiteCfg()


def _ln_dummy():
    """Placeholder operand for a disabled LN stage (never read)."""
    return jnp.zeros((128,), jnp.float32)


def _ln_rows(x32, s_ref, b_ref, eps):
    """f32 row LayerNorm inside the kernel — the exact formula of
    ops.norms._ln_exact (fast variance, rsqrt) so the fused and unfused
    roads agree to rounding."""
    mean = jnp.mean(x32, axis=1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)

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
# Head-loop emission order inside _fused_kernel [VERDICT r4 #3a — the
# ~2.5 ms/call softmax-phase MXU idle in the BERT fused calls]:
#   'interleaved' — score→softmax→PV per head (historical order);
#   'lookahead'   — emit head h+1's score matmul BEFORE head h's
#                   softmax/PV, so an MXU op always sits between VPU
#                   phases in program order (two explicit streams);
#   'phased'      — all score matmuls, one stacked softmax, all PVs
#                   (the r3 *unfused* phase-separated variant lost; with
#                   operands VMEM-resident the trade differs — measured
#                   per BENCH_NOTES).
# Same dataflow DAG in all three — only the emission order presented to
# Mosaic's scheduler changes; numerics identical.
_FUSED_SCHEDULE = _os.environ.get("BTIA_FUSED_SCHEDULE", "interleaved")


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
    qls_ref,
    qlb_ref,
    kls_ref,
    klb_ref,
    pos_ref,
    pob_ref,
    o_ref,
    *,
    num_heads,
    bb,
    sq,
    sk,
    site,
):
    hd = wq_ref.shape[1]
    d = hd // num_heads
    cd = xq_ref.dtype

    xq_raw = xq_ref[...].reshape(bb * sq, xq_ref.shape[2])
    xkv = xkv_ref[...].reshape(bb * sk, xkv_ref.shape[2])
    # Prologue LN (site fusion): normalize the raw streams in VMEM — the
    # separate LN op's HBM read+write disappears, and the residual below
    # reuses the RAW rows already resident.
    if site.q_ln_eps:
        xq = _ln_rows(
            xq_raw.astype(jnp.float32), qls_ref, qlb_ref, site.q_ln_eps
        ).astype(cd)
    else:
        xq = xq_raw
    if site.kv_ln_eps:
        xkv = _ln_rows(
            xkv.astype(jnp.float32), kls_ref, klb_ref, site.kv_ln_eps
        ).astype(cd)

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

    def head_score(h):
        sl = slice(h * d, (h + 1) * d)
        return (
            jax.lax.dot_general(
                q[:, sl],
                k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - neg_bias
        )

    def head_pv(h, s):
        sl = slice(h * d, (h + 1) * d)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m) * mask
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        acc = jax.lax.dot_general(
            e.astype(cd),
            v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (acc / denom).astype(cd)

    # Emission-order A/B [VERDICT r4 #3a]: same DAG, different schedule
    # hint — see _FUSED_SCHEDULE.
    outs = []
    if _FUSED_SCHEDULE == "phased":
        scores = [head_score(h) for h in range(num_heads)]
        outs = [head_pv(h, scores[h]) for h in range(num_heads)]
    elif _FUSED_SCHEDULE == "lookahead":
        s_next = head_score(0)
        for h in range(num_heads):
            s_cur = s_next
            if h + 1 < num_heads:
                s_next = head_score(h + 1)
            outs.append(head_pv(h, s_cur))
    else:
        for h in range(num_heads):
            outs.append(head_pv(h, head_score(h)))
    attn = jnp.concatenate(outs, axis=-1)

    out = jax.lax.dot_general(
        attn,
        wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (out + bo_ref[...]).astype(o_ref.dtype)
    # Epilogue (site fusion): residual in compute dtype (matching the
    # module's historical x + attn_out add), then f32 post-LN — BERT's
    # post-LN block order LN(x + attn) [models/bert.py].
    if site.residual:
        out = xq_raw.astype(o_ref.dtype) + out
    if site.post_ln_eps:
        out = _ln_rows(
            out.astype(jnp.float32), pos_ref, pob_ref, site.post_ln_eps
        ).astype(o_ref.dtype)
    o_ref[...] = out.reshape(bb, sq, wo_ref.shape[1])


def _fused_pallas(
    x_q, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo, bo, lns, num_heads,
    interpret, site,
):
    B, Sq, Din = x_q.shape
    Sk = x_kv.shape[1]
    HD = wq.shape[1]
    Dout = wo.shape[1]
    D = HD // num_heads
    scale = 1.0 / (D**0.5)
    cd = x_q.dtype
    # (scale, bias) for the q-LN / kv-LN / post-LN stages; disabled
    # stages carry never-read dummies.
    lns = tuple(a.astype(jnp.float32).reshape(1, -1) for a in lns)

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
            _fused_kernel, num_heads=num_heads, bb=bb, sq=Sq, sk=Sk,
            site=site,
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
        + [wspec(b2(b)) for b in (bq, bk, bv, bo)]
        + [wspec(a) for a in lns],
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
    )(x_q, x_kv, cm, wq, wk, wv, wo, b2(bq), b2(bk), b2(bv), b2(bo), *lns)
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


def _colmask(kv_mask, x_kv):
    return (
        kv_mask.astype(jnp.float32)
        if kv_mask is not None
        else jnp.ones(x_kv.shape[:2], jnp.float32)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _fused(x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret):
    d = _ln_dummy()
    return _fused_pallas(
        x_q, x_kv, _colmask(kv_mask, x_kv), wq, bq, wk, bk, wv, bv, wo, bo,
        (d,) * 6, num_heads, interpret, _PLAIN_SITE,
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


def _unfused_site(
    x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
    qls, qlb, kls, klb, pos, pob, num_heads, site,
):
    """Unfused mirror of the site-fused kernel: the SAME composition the
    modules historically spelled out (pre-LN → attention → residual →
    post-LN), via ops.norms.layernorm — the semantics oracle and the vjp
    rematerialisation for _fused_site."""
    xq_in = (
        layernorm(x_q, qls, qlb, site.q_ln_eps) if site.q_ln_eps else x_q
    )
    xkv_in = (
        layernorm(x_kv, kls, klb, site.kv_ln_eps) if site.kv_ln_eps else x_kv
    )
    out = _unfused(
        xq_in, xkv_in, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
    )
    if site.residual:
        out = x_q + out
    if site.post_ln_eps:
        out = layernorm(out, pos, pob, site.post_ln_eps)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19))
def _fused_site(
    x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
    qls, qlb, kls, klb, pos, pob, num_heads, interpret, site,
):
    return _fused_pallas(
        x_q, x_kv, _colmask(kv_mask, x_kv), wq, bq, wk, bk, wv, bv, wo, bo,
        (qls, qlb, kls, klb, pos, pob), num_heads, interpret, site,
    )


def _fused_site_fwd(
    x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
    qls, qlb, kls, klb, pos, pob, nh, interp, site,
):
    out = _fused_site(
        x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
        qls, qlb, kls, klb, pos, pob, nh, interp, site,
    )
    return out, (
        x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
        qls, qlb, kls, klb, pos, pob,
    )


def _fused_site_bwd(nh, interp, site, res, g):
    x_q, x_kv, kv_mask, *params = res
    f = lambda xq, xkv, *p: _unfused_site(
        xq, xkv, kv_mask, *p, num_heads=nh, site=site
    )
    _, vjp = jax.vjp(f, x_q, x_kv, *params)
    grads = vjp(g)
    return (grads[0], grads[1], None) + tuple(grads[2:])


_fused_site.defvjp(_fused_site_fwd, _fused_site_bwd)


def _fused_over_mesh(
    x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
    interpret, mesh, tp, lns=None, site=_PLAIN_SITE,
):
    """The fused kernel under an explicit shard_map partitioning:
    batch over 'data', heads (q/k/v projection columns) over 'model',
    output projection rows over 'model' with a psum of the partials.
    Each shard runs the proven single-device custom_vjp; pjit never sees
    an unpartitioned custom call (the round-3 multi-chip hazard).

    Site fusion under TP>1: the prologue LNs stay in-kernel (the feature
    dim is unsharded), but the epilogue (residual/post-LN) must act on
    the REASSEMBLED output, so it runs per shard in XLA after the psum."""
    from jax.sharding import PartitionSpec as P

    colmask = _colmask(kv_mask, x_kv)
    nh_shard = num_heads // tp
    if lns is None:
        lns = (_ln_dummy(),) * 6
    kernel_site = site.prologue_only() if tp > 1 else site

    def per_shard(xq, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
                  qls, qlb, kls, klb, pos, pob):
        out = _fused_site(
            xq, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
            qls, qlb, kls, klb, pos, pob, nh_shard, interpret, kernel_site,
        )
        if tp > 1:
            out = jax.lax.psum(out, "model")
            if site.residual:
                out = xq + out
            if site.post_ln_eps:
                out = layernorm(out, pos, pob, site.post_ln_eps)
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
            P(None), P(None), P(None), P(None), P(None), P(None),
        ),
        out_specs=P("data"),
        check_vma=False,  # custom_vjp inside defeats replication inference
    )
    # Each rank adds its bias share; the 'model' psum reassembles bo.
    return fn(
        x_q, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo,
        (bo.astype(jnp.float32) / tp).astype(bo.dtype),
        *lns,
    )


def _staticq_kernel(
    xkv_ref,
    cmask_ref,
    q2_ref,
    qraw_ref,
    wk_ref,
    wv_ref,
    wo_ref,
    bk_ref,
    bv_ref,
    bo_ref,
    kls_ref,
    klb_ref,
    o_ref,
    *,
    num_heads,
    bb,
    nq,
    sk,
    site,
):
    cd = xkv_ref.dtype
    hd = q2_ref.shape[1]
    d = hd // num_heads
    xkv = xkv_ref[...].reshape(bb * sk, xkv_ref.shape[2])
    if site.kv_ln_eps:
        # Prologue LN on the fused-token stream (the AD head's ln_kv) —
        # in VMEM, so the separate LN op's HBM round trip disappears.
        xkv = _ln_rows(
            xkv.astype(jnp.float32), kls_ref, klb_ref, site.kv_ln_eps
        ).astype(cd)

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
    if site.residual:
        # The AD head's feats = queries + attended: the raw (VMEM-
        # resident) query table adds per packed batch element.
        qraw = qraw_ref[...].astype(o_ref.dtype)
        if bb > 1:
            qraw = jnp.concatenate([qraw] * bb, axis=0)
        out = qraw + out
    o_ref[...] = out.reshape(bb, nq, wo_ref.shape[1])


def _staticq_pallas(
    queries, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
    interpret, lns=None, site=_PLAIN_SITE,
):
    B, Sk, Din = x_kv.shape
    K = queries.shape[0]
    HD = wq.shape[1]
    Dout = wo.shape[1]
    D = HD // num_heads
    cd = x_kv.dtype
    if lns is None:
        lns = (_ln_dummy(),) * 2
    kls, klb = (a.astype(jnp.float32).reshape(1, -1) for a in lns)

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
    qraw = queries.astype(cd)
    out = pl.pallas_call(
        functools.partial(
            _staticq_kernel, num_heads=num_heads, bb=bb, nq=K, sk=Sk,
            site=site,
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
        + [wspec(w) for w in (q2, qraw, wk, wv, wo, bk, bv, bo, kls, klb)],
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
    )(x_kv, cm, q2, qraw, wk, wv, wo, bk, bv, bo, kls, klb)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _staticq(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret
):
    return _staticq_pallas(
        queries, x_kv, _colmask(kv_mask, x_kv), wq, bq, wk, bk, wv, bv, wo, bo,
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


def _staticq_unfused_site(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, kls, klb,
    num_heads, site,
):
    """Unfused mirror of the site-fused static-q kernel — the AD head's
    historical composition (ln_kv → broadcast-query attention →
    queries + attended), models/heads.py."""
    xkv_in = (
        layernorm(x_kv, kls, klb, site.kv_ln_eps) if site.kv_ln_eps else x_kv
    )
    out = _staticq_unfused(
        queries, xkv_in, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
    )
    if site.residual:
        B = x_kv.shape[0]
        out = (
            jnp.broadcast_to(
                queries[None].astype(out.dtype), (B,) + queries.shape
            )
            + out
        )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def _staticq_site(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, kls, klb,
    num_heads, interpret, site,
):
    return _staticq_pallas(
        queries, x_kv, _colmask(kv_mask, x_kv), wq, bq, wk, bk, wv, bv,
        wo, bo, num_heads, interpret, (kls, klb), site,
    )


def _staticq_site_fwd(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, kls, klb,
    nh, it, site,
):
    out = _staticq_site(
        queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, kls, klb,
        nh, it, site,
    )
    return out, (
        queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, kls, klb
    )


def _staticq_site_bwd(nh, it, site, res, g):
    queries, x_kv, kv_mask, *params = res
    f = lambda qs, xkv, *p: _staticq_unfused_site(
        qs, xkv, kv_mask, *p, num_heads=nh, site=site
    )
    _, vjp = jax.vjp(f, queries, x_kv, *params)
    grads = vjp(g)
    return (grads[0], grads[1], None) + tuple(grads[2:])


_staticq_site.defvjp(_staticq_site_fwd, _staticq_site_bwd)


def _staticq_over_mesh(
    queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
    interpret, mesh, tp, lns=None, site=_PLAIN_SITE,
):
    """fused_static_q_attention under shard_map (see _fused_over_mesh):
    the batch-invariant query table replicates; everything else follows
    the same data/model partitioning. Under TP>1 the query residual
    applies per shard AFTER the psum (kernel outputs are partial)."""
    from jax.sharding import PartitionSpec as P

    colmask = _colmask(kv_mask, x_kv)
    nh_shard = num_heads // tp
    if lns is None:
        lns = (_ln_dummy(),) * 2
    kernel_site = site.prologue_only() if tp > 1 else site

    def per_shard(qs, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
                  kls, klb):
        out = _staticq_site(
            qs, xkv, cm, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_, kls, klb,
            nh_shard, interpret, kernel_site,
        )
        if tp > 1:
            out = jax.lax.psum(out, "model")
            if site.residual:
                out = qs[None].astype(out.dtype) + out
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
            P(None), P(None),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(
        queries, x_kv, colmask, wq, bq, wk, bk, wv, bv, wo,
        (bo.astype(jnp.float32) / tp).astype(bo.dtype),
        *lns,
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
    kv_ln: Optional[Tuple[jax.Array, jax.Array, float]] = None,
    residual: bool = False,
) -> jax.Array:
    """Attention whose queries are a batch-invariant (K, Din) table — the
    AD answer head's answer-query attention [B:5, B:10]. On the fused
    path the query projection happens once (not per batch row) and k/v/o
    projections fuse into the kernel; otherwise the queries broadcast
    through the plain unfused road (the historical lowering).

    Site fusion (SiteCfg): kv_ln=(scale, bias, eps) folds the head's
    pre-attention LayerNorm into the kernel prologue; residual=True adds
    the raw query table to the projected output in-kernel (the head's
    queries + attended) — both stages otherwise cost full HBM round
    trips around the custom call."""
    B, Sk, _ = x_kv.shape
    K = queries.shape[0]
    HD = wq.shape[1]
    D = HD // num_heads
    site = SiteCfg(
        kv_ln_eps=kv_ln[2] if kv_ln is not None else 0.0,
        residual=residual,
    )
    lns = (
        (kv_ln[0], kv_ln[1]) if kv_ln is not None else None
    )
    if residual:
        assert wo.shape[1] == queries.shape[1], "residual needs Dout == Din"
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
        if site == _PLAIN_SITE:
            return _staticq_unfused(
                queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
                num_heads,
            )
        d = _ln_dummy()
        kls, klb = lns if lns is not None else (d, d)
        return _staticq_unfused_site(
            queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
            kls, klb, num_heads, site,
        )
    if mesh is None:
        if site == _PLAIN_SITE:
            return _staticq(
                queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
                num_heads, interpret,
            )
        d = _ln_dummy()
        kls, klb = lns if lns is not None else (d, d)
        return _staticq_site(
            queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
            kls, klb, num_heads, interpret, site,
        )
    return _staticq_over_mesh(
        queries, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads, interpret, mesh, tp, lns, site,
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
    q_ln: Optional[Tuple[jax.Array, jax.Array, float]] = None,
    kv_ln: Optional[Tuple[jax.Array, jax.Array, float]] = None,
    residual: bool = False,
    post_ln: Optional[Tuple[jax.Array, jax.Array, float]] = None,
) -> jax.Array:
    """q/k/v projection → MHA → output projection, fused where it wins.

    x_q: (B, Sq, Din); x_kv: (B, Sk, Din); kv_mask: (B, Sk) True=valid.
    Routing mirrors ops.mha_bshd: the fused Pallas kernel on TPU for
    short sequences at serving batch sizes; plain XLA otherwise.

    Site fusion (SiteCfg): each of q_ln/kv_ln/post_ln is a
    (scale, bias, eps) tuple folding that LayerNorm into the kernel;
    residual=True adds the RAW x_q to the projected output in-kernel.
    Together these express the surrounding transformer block —
    pre-LN + residual (BTIA/ViT order) or residual + post-LN (BERT
    order) — without the HBM round trips XLA cannot fuse across the
    custom-call boundary. The unfused road applies the identical
    composition in XLA (same layernorm function the modules used), so
    semantics do not depend on routing.
    """
    B, Sq, _ = x_q.shape
    Sk = x_kv.shape[1]
    HD = wq.shape[1]
    D = HD // num_heads
    site = SiteCfg(
        q_ln_eps=q_ln[2] if q_ln is not None else 0.0,
        kv_ln_eps=kv_ln[2] if kv_ln is not None else 0.0,
        residual=residual,
        post_ln_eps=post_ln[2] if post_ln is not None else 0.0,
    )
    if residual or post_ln is not None:
        assert wo.shape[1] == x_q.shape[-1], "epilogue needs Dout == Din_q"
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
    if site == _PLAIN_SITE:
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
    d = _ln_dummy()
    lns = (
        *( (q_ln[0], q_ln[1]) if q_ln is not None else (d, d) ),
        *( (kv_ln[0], kv_ln[1]) if kv_ln is not None else (d, d) ),
        *( (post_ln[0], post_ln[1]) if post_ln is not None else (d, d) ),
    )
    if not use_fused:
        return _unfused_site(
            x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
            *lns, num_heads, site,
        )
    if mesh is None:
        return _fused_site(
            x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
            *lns, num_heads, interpret, site,
        )
    return _fused_over_mesh(
        x_q, x_kv, kv_mask, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads, interpret, mesh, tp, lns, site,
    )
