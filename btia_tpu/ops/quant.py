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

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# ---------------------------------------------------------------------------
# Fused-epilogue int8 matmul (Pallas) — the round-2 serving lever.
#
# BENCH_NOTES measured UNFUSED int8 as a wash (63 vs 65 TFLOP/s): the
# separate activation-quant pass costs an extra HBM round trip that cancels
# the 2× MXU rate. Here the per-row quantization happens on the VMEM-resident
# x block inside the matmul kernel (recomputed per N-tile — VPU work that is
# ~TN× smaller than the MXU work it unlocks), and the dequant-rescale, bias
# and activation fuse into the epilogue, so the only HBM traffic is
# bf16 x in + int8 w in + bf16 y out.
# ---------------------------------------------------------------------------


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _int8_mm_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, xi_ref, sx_ref, *, act):
    # Quantize the (TM, K) x block ONCE per M-tile into VMEM scratch; the
    # N-tiles (inner grid dim) reuse it. Recomputing the quantize per
    # N-tile was measured to cancel the whole int8 MXU win (VPU-bound).
    @pl.when(pl.program_id(1) == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)  # (TM, K)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        sx_ref[:] = sx
        xi_ref[:] = jnp.round(x * (1.0 / sx)).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xi_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx_ref[:] * ws_ref[:] + b_ref[:]
    if act is not None:
        y = act(y)
    o_ref[:] = y.astype(o_ref.dtype)


def int8_matmul_fused(
    x: jax.Array,
    w_i8: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[Callable] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x (M, K) @ dequant(w_i8 (K, N)) + bias, then act — one Pallas call.

    Per-row activation quantization runs on the VMEM x block (no HBM round
    trip); the int8×int8→int32 dot rides the MXU at 2× the bf16 rate; the
    f32 rescale/bias/activation epilogue writes bf16 straight out.
    """
    M, K = x.shape
    N = w_i8.shape[1]
    if interpret is None:
        interpret = not _on_tpu()  # CPU tests run the kernel interpreted
    if block_m is None:
        # Keep x(f32 temp)+x_i8+w+acc under ~8 MB of VMEM.
        block_m = 256 if K > 1024 else 512
    # Any output width must work (users override hidden_dim freely). Pad N
    # up to a lane-aligned multiple of 128 and slice the result: one
    # lane-aligned code path for every width, instead of degrading to a
    # tiny (possibly non-lane) divisor for awkward N (e.g. prime), which
    # Mosaic may refuse or run slowly on real hardware.
    Np = _cdiv(N, 128) * 128
    block_n = min(block_n, Np)
    if Np % block_n:
        # Largest multiple of 128 dividing Np and ≤ requested block_n
        # (always succeeds: 128 divides Np by construction).
        start = max(128, block_n - block_n % 128)
        block_n = next(b for b in range(start, 0, -128) if Np % b == 0)
    if Np != N:
        w_i8 = jnp.pad(w_i8, ((0, 0), (0, Np - N)))
        w_scale = jnp.pad(w_scale.reshape(-1), (0, Np - N))
        if bias is not None:
            bias = jnp.pad(bias.reshape(-1), (0, Np - N))
    Mp = _cdiv(M, block_m) * block_m
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    ws = w_scale.reshape(1, Np).astype(jnp.float32)
    b = (
        bias.reshape(1, Np)
        if bias is not None
        else jnp.zeros((1, Np))
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_int8_mm_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_m, K), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # Sequential grid: the scratch quantization written at j==0 is
            # reused by the remaining N-tiles of the same M-tile.
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * Np,
            bytes_accessed=Mp * K * 2 + K * Np + Mp * Np * 2,
            transcendentals=Mp * Np if act is not None else 0,
        ),
        interpret=interpret,
    )(x, w_i8, ws, b)
    return out[:M, :N] if (Mp != M or Np != N) else out


def int8_matmul_fused_reference(
    x: jax.Array,
    w_i8: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[Callable] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Plain-XLA oracle for the fused kernel (same math, unfused)."""
    x_i8, x_scale = quantize_activation(x)
    y = jax.lax.dot_general(
        x_i8,
        w_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if act is not None:
        y = act(y)
    return y.astype(out_dtype)


def quantization_error(w: jax.Array) -> float:
    """Max relative reconstruction error of per-channel int8 for a weight."""
    w_i8, s = quantize_weight(w)
    recon = w_i8.astype(jnp.float32) * s
    denom = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32))), 1e-8)
    return float(jnp.max(jnp.abs(recon - w.astype(jnp.float32))) / denom)
