"""Fused BTIA bidirectional cross-attention kernel.

The BTIA block's core op [B:5 "BTIA bidirectional image↔question
cross-attention fusion block"] runs TWO attentions per layer:

  img ← txt : out_i = softmax(Q_img K_txtᵀ / √d) V_txt   (question-guided)
  txt ← img : out_t = softmax(Q_txt K_imgᵀ / √d) V_img   (image-guided)

A naive lowering launches two kernels and re-reads the projected tensors
from HBM. This kernel fuses both directions into ONE pallas_call per
(batch, head) program: all six Q/K/V slices live in VMEM together and both
score tiles stay on-chip. Question padding is masked in the img←txt
direction; image tokens are always dense (fixed patch/grid count).

Backward: custom_vjp recomputing both directions with XLA ops (remat).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from btia_tpu.ops.attention import (
    _LOG2E,
    _NEG_INF,
    _attn_block_log2,
    _resolved_impl,
    _round_up,
    mha_reference,
)


def bicross_reference(
    qi, ki, vi, qt, kt, vt, txt_mask: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """XLA oracle. qi/ki/vi: (B,H,Ni,D) image-side; qt/kt/vt: (B,H,Nt,D) text.

    Returns (out_img (B,H,Ni,D), out_txt (B,H,Nt,D)).
    """
    out_i = mha_reference(qi, kt, vt, txt_mask)
    out_t = mha_reference(qt, ki, vi, None)
    return out_i, out_t


def _bicross_pallas(qi, ki, vi, qt, kt, vt, txt_mask, interpret: bool):
    B, H, Ni, D = qi.shape
    Nt = qt.shape[2]
    scale = 1.0 / (D**0.5)

    # Head dim stays unpadded (Mosaic masks lanes in VMEM; HBM pads cost
    # real bandwidth — see ops/attention.py).
    Dp = D if D % 64 == 0 else _round_up(D, 128)
    Nip = _round_up(Ni, 128)  # image tokens are lanes in the txt←img tile
    Ntp = _round_up(Nt, 128)

    pad4 = lambda x, S, Sp: jnp.pad(
        x, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D))
    )
    # Log2-domain prescale of both query sides (see attention._attn_block_log2):
    # exp2 softmax, no per-element score multiply.
    prescale = lambda x: (x.astype(jnp.float32) * (scale * _LOG2E)).astype(
        x.dtype
    )
    qi, qt = prescale(qi), prescale(qt)
    qip, kip, vip = pad4(qi, Ni, Nip), pad4(ki, Ni, Nip), pad4(vi, Ni, Nip)
    qtp, ktp, vtp = pad4(qt, Nt, Ntp), pad4(kt, Nt, Ntp), pad4(vt, Nt, Ntp)

    if txt_mask is None:
        txt_mask = jnp.ones((B, Nt), dtype=bool)
    maskp = jnp.pad(txt_mask, ((0, 0), (0, Ntp - Nt)))
    bias = jnp.where(maskp, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    # txt←img: padded image keys would corrupt the softmax; mask them.
    img_bias = jnp.where(
        jnp.arange(Nip) < Ni, 0.0, _NEG_INF
    ).astype(jnp.float32)[None, None, :]

    # txt←img direction: padded image keys only exist when Ni isn't a
    # multiple of 128 — skip the bias add entirely otherwise.
    img_has_bias = Nip != Ni

    def kernel(
        qi_ref, kt_ref, vt_ref, qt_ref, ki_ref, vi_ref, bias_ref, ibias_ref,
        oi_ref, ot_ref,
    ):
        oi_ref[0, 0] = _attn_block_log2(
            qi_ref[0, 0], kt_ref[0, 0], vt_ref[0, 0], bias_ref[0]
        ).astype(oi_ref.dtype)
        ot_ref[0, 0] = _attn_block_log2(
            qt_ref[0, 0],
            ki_ref[0, 0],
            vi_ref[0, 0],
            ibias_ref[0] if img_has_bias else None,
        ).astype(ot_ref.dtype)

    spec = lambda S: pl.BlockSpec(
        (1, 1, S, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    out_i, out_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nip, Dp), qi.dtype),
            jax.ShapeDtypeStruct((B, H, Ntp, Dp), qt.dtype),
        ),
        grid=(B, H),
        in_specs=[
            spec(Nip),  # qi
            spec(Ntp),  # kt
            spec(Ntp),  # vt
            spec(Ntp),  # qt
            spec(Nip),  # ki
            spec(Nip),  # vi
            pl.BlockSpec(
                (1, 1, Ntp), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Nip), lambda b, h: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(spec(Nip), spec(Ntp)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * Nip * Ntp * Dp,
            bytes_accessed=2
            * (qip.size + ktp.size + vtp.size + qtp.size + kip.size + vip.size)
            * qip.dtype.itemsize,
            transcendentals=2 * B * H * Nip * Ntp,
        ),
        interpret=interpret,
    )(qip, ktp, vtp, qtp, kip, vip, bias, img_bias)
    return out_i[:, :, :Ni, :D], out_t[:, :, :Nt, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _bicross(qi, ki, vi, qt, kt, vt, txt_mask, use_pallas, interpret):
    if use_pallas:
        return _bicross_pallas(qi, ki, vi, qt, kt, vt, txt_mask, interpret)
    return bicross_reference(qi, ki, vi, qt, kt, vt, txt_mask)


def _bicross_fwd(qi, ki, vi, qt, kt, vt, txt_mask, use_pallas, interpret):
    out = _bicross(qi, ki, vi, qt, kt, vt, txt_mask, use_pallas, interpret)
    return out, (qi, ki, vi, qt, kt, vt, txt_mask)


def _bicross_bwd(use_pallas, interpret, res, grads):
    qi, ki, vi, qt, kt, vt, txt_mask = res
    gi, gt = grads

    def dir1(qi_, kt_, vt_):
        return mha_reference(qi_, kt_, vt_, txt_mask)

    def dir2(qt_, ki_, vi_):
        return mha_reference(qt_, ki_, vi_, None)

    _, vjp1 = jax.vjp(dir1, qi, kt, vt)
    _, vjp2 = jax.vjp(dir2, qt, ki, vi)
    dqi, dkt, dvt = vjp1(gi)
    dqt, dki, dvi = vjp2(gt)
    return dqi, dki, dvi, dqt, dkt, dvt, None


_bicross.defvjp(_bicross_fwd, _bicross_bwd)


def bicross_attention(
    qi: jax.Array,
    ki: jax.Array,
    vi: jax.Array,
    qt: jax.Array,
    kt: jax.Array,
    vt: jax.Array,
    txt_mask: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused bidirectional cross-attention (the BTIA core op).

    Image side (B, H, Ni, Dh), text side (B, H, Nt, Dh); txt_mask (B, Nt)
    True=valid. Returns (out_img, out_txt).
    """
    if impl is None:
        impl = _resolved_impl()
        # Same small-tile heuristic as ops.attention.mha: for the pooled
        # fan-out sequences the per-(b,h) program grid is pure overhead.
        from btia_tpu.ops.attention import _SMALL_SCORE_TILE

        if impl == "pallas" and qi.shape[2] * qt.shape[2] <= _SMALL_SCORE_TILE:
            impl = "xla"
    return _bicross(qi, ki, vi, qt, kt, vt, txt_mask, impl == "pallas", interpret)


def bicross_bshd(
    qi: jax.Array,
    ki: jax.Array,
    vi: jax.Array,
    qt: jax.Array,
    kt: jax.Array,
    vt: jax.Array,
    txt_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Bidirectional cross-attention over (B, S, H, Dh) tensors.

    Transpose-free einsum path for small score tiles (the pooled fan-out
    shapes, cf. ops.attention.mha_bshd); the fused Pallas kernel (which
    needs head-major layout) for long sequences.
    """
    from btia_tpu.ops.attention import _SMALL_SCORE_TILE, _resolved_impl, mha_bshd

    use_pallas = (
        _resolved_impl() == "pallas"
        and qi.shape[1] * qt.shape[1] > _SMALL_SCORE_TILE
    )
    if use_pallas:
        t = lambda x: x.transpose(0, 2, 1, 3)
        oi, ot = bicross_attention(
            t(qi), t(ki), t(vi), t(qt), t(kt), t(vt), txt_mask,
            impl="pallas", interpret=interpret,
        )
        return t(oi), t(ot)
    return (
        mha_bshd(qi, kt, vt, txt_mask, interpret=interpret),
        mha_bshd(qt, ki, vi, None, interpret=interpret),
    )
