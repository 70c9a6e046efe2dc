"""LayerNorm op tests: exact formula vs flax, Pallas kernel (interpret)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from btia_tpu.ops.norms import _layernorm_pallas, _ln_exact, layernorm


class TestLayerNorm:
    def test_matches_flax(self, rng):
        x = jnp.asarray(rng.randn(5, 64) * 2 + 1, jnp.float32)
        scale = jnp.asarray(rng.randn(64), jnp.float32)
        bias = jnp.asarray(rng.randn(64), jnp.float32)
        flax_ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        ref = flax_ln.apply({"params": {"scale": scale, "bias": bias}}, x)
        ours = layernorm(x, scale, bias, 1e-6)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(ours), atol=1e-5)

    def test_pallas_kernel_matches_exact(self, rng):
        x = jnp.asarray(rng.randn(37, 256) * 3, jnp.float32)
        scale = jnp.asarray(rng.randn(256), jnp.float32)
        bias = jnp.asarray(rng.randn(256), jnp.float32)
        ref = _ln_exact(x, scale, bias, 1e-6)
        pal = _layernorm_pallas(x, scale, bias, 1e-6, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-5)

    def test_bf16_output_dtype(self, rng):
        x = jnp.asarray(rng.randn(4, 128), jnp.bfloat16)
        out = layernorm(x, jnp.ones(128), jnp.zeros(128))
        assert out.dtype == jnp.bfloat16

    def test_grad_finite(self, rng):
        x = jnp.asarray(rng.randn(4, 64), jnp.float32)
        s, b = jnp.ones(64), jnp.zeros(64)
        g = jax.grad(lambda x: jnp.sum(layernorm(x, s, b) ** 2))(x)
        assert bool(jnp.isfinite(g).all())
