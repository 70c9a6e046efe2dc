"""Int8 quantization op tests [BENCH_NOTES round-2 lever]."""

import jax.numpy as jnp
import numpy as np

from btia_tpu.ops.quant import (
    int8_matmul,
    quantization_error,
    quantize_activation,
    quantize_weight,
)


class TestQuant:
    def test_weight_roundtrip_error_small(self, rng):
        w = jnp.asarray(rng.randn(64, 32), jnp.float32)
        assert quantization_error(w) < 0.01

    def test_activation_range(self, rng):
        x = jnp.asarray(rng.randn(4, 16) * 10, jnp.float32)
        x_i8, s = quantize_activation(x)
        assert int(jnp.abs(x_i8).max()) <= 127
        recon = x_i8.astype(jnp.float32) * s
        np.testing.assert_allclose(
            np.asarray(recon), np.asarray(x), atol=float(s.max()) * 0.51
        )

    def test_int8_matmul_close_to_fp(self, rng):
        x = jnp.asarray(rng.randn(8, 64), jnp.float32)
        w = jnp.asarray(rng.randn(64, 32) * 0.1, jnp.float32)
        ref = x @ w
        w_i8, ws = quantize_weight(w)
        out = int8_matmul(x, w_i8, ws, out_dtype=jnp.float32)
        rel = np.abs(np.asarray(out - ref)) / (np.abs(np.asarray(ref)) + 1e-3)
        assert rel.mean() < 0.05, rel.mean()

    def test_batched_input(self, rng):
        x = jnp.asarray(rng.randn(2, 5, 64), jnp.float32)
        w = jnp.asarray(rng.randn(64, 32) * 0.1, jnp.float32)
        w_i8, ws = quantize_weight(w)
        out = int8_matmul(x, w_i8, ws)
        assert out.shape == (2, 5, 32)
