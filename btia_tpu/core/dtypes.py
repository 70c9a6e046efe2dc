"""Mixed-precision policy for TPU.

TPU-first design rule: keep MXU work (matmuls, convs, attention) in bfloat16
and accumulate/reduce in float32. The reference (PyTorch, single GPU) ran
fp32 end-to-end [SURVEY §2.4]; on TPU that halves MXU throughput and doubles
HBM traffic, so the compute dtype defaults to bf16 with fp32 params/softmax.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Dtype policy threaded through every module.

    param_dtype:   dtype parameters are stored in (fp32 for optimizer quality).
    compute_dtype: dtype activations/matmuls run in (bf16 to hit the MXU
                   at full rate).
    accum_dtype:   dtype for softmax/log-sum-exp/variance accumulation.
    int8:          serve FFN matmuls through the fused-epilogue int8 Pallas
                   kernel (ops/quant.py) — inference only; training and the
                   fp32 parity path always run the plain matmul.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32
    int8: bool = False

    def cast(self, x):
        return x.astype(self.compute_dtype)


def default_policy(mixed: bool = True) -> DTypePolicy:
    if mixed:
        return DTypePolicy()
    return DTypePolicy(compute_dtype=jnp.float32)


FP32_POLICY = DTypePolicy(compute_dtype=jnp.float32)
BF16_POLICY = DTypePolicy()
