"""Int8 matmul building blocks for quantized serving [round-2 lever,
BENCH_NOTES]. v5e executes int8×int8→int32 on the MXU at 2× the bf16 rate;
the serving fan-out (BTIA/BERT FFNs) is MXU-bound, so dynamic-activation ×
static-weight int8 is the next big throughput step.

Provided ops (all jit/pjit-safe, differentiable not required — serving):
  quantize_weight:  fp32/bf16 (in, out) kernel → (int8 kernel, per-out-col scale)
  int8_matmul:      dynamic per-row activation quant → int8×int8→int32 →
                    rescale to bf16/f32
Pallas stochastic-round quantization is intentionally NOT used here —
round-to-nearest is the standard for post-training weight quant.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8. w: (in, out) → (w_i8, scale (out,))."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return w_i8, scale


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row (token) symmetric int8. x: (..., in) → (x_i8, scale (..., 1))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return x_i8, scale


def int8_matmul(
    x: jax.Array,
    w_i8: jax.Array,
    w_scale: jax.Array,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """x (..., in) @ dequant(w_i8 (in, out)) with dynamic activation quant.

    The int32-accumulating int8 dot runs on the MXU at 2× bf16 throughput;
    rescaling fuses into the epilogue.
    """
    x_i8, x_scale = quantize_activation(x)
    y = jax.lax.dot_general(
        x_i8,
        w_i8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def quantization_error(w: jax.Array) -> float:
    """Max relative reconstruction error of per-channel int8 for a weight."""
    w_i8, s = quantize_weight(w)
    recon = w_i8.astype(jnp.float32) * s
    denom = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32))), 1e-8)
    return float(jnp.max(jnp.abs(recon - w.astype(jnp.float32))) / denom)
