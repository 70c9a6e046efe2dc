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

import jax
import jax.numpy as jnp


def layernorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    fast: bool = False,
) -> jax.Array:
    """Normalize over the last axis. Returns x.dtype."""
    D = x.shape[-1]
    if not fast:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mean2 - mean * mean)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x.dtype
        )

    # MXU statistics: [sum(x), sum(x²)] in one fp32-accumulating matmul.
    ones = jnp.ones((D, 1), x.dtype)
    flat = x.reshape(-1, D)
    sums = jax.lax.dot_general(
        jnp.concatenate([flat, flat * flat], axis=0),
        ones,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    M = flat.shape[0]
    mean = sums[:M] / D
    mean2 = sums[M:] / D
    var = jnp.maximum(0.0, mean2 - mean * mean)
    inv = jax.lax.rsqrt(var + eps)  # (M, 1) fp32
    shape = x.shape[:-1] + (1,)
    a = (inv).reshape(shape).astype(x.dtype)
    b = (mean * inv).reshape(shape).astype(x.dtype)
    # y = (x*a - b) * scale + bias, all elementwise in compute dtype.
    return (x * a - b) * scale.astype(x.dtype) + bias.astype(x.dtype)
