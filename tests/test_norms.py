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


class TestMlpGeluPolicy:
    """The Mlp activation is policy-selected (BENCH_NOTES r3): exact-erf
    GELU on the fp32 parity path (torch/HF convention), tanh approximation
    on the bf16 serving path where erf throttled every fused MLP chain
    (81→105 TF/s at the BTIA img fc1 shape) and |erf−tanh| ≈ 3e-3 sits
    below bf16's rounding step."""

    def _apply(self, policy, x, rng):
        from btia_tpu.models.layers import Mlp

        m = Mlp(dim=x.shape[-1], hidden_dim=2 * x.shape[-1], policy=policy)
        vars_ = m.init(jax.random.PRNGKey(0), x)
        return m.apply(vars_, x), vars_, m

    def _manual(self, vars_, x, policy, approximate):
        w1 = vars_["params"]["fc1"]["kernel"].astype(policy.compute_dtype)
        b1 = vars_["params"]["fc1"]["bias"]
        w2 = vars_["params"]["fc2"]["kernel"].astype(policy.compute_dtype)
        b2 = vars_["params"]["fc2"]["bias"]
        cd = policy.compute_dtype
        h = x.astype(cd) @ w1 + b1.astype(jnp.float32 if cd == jnp.float32 else cd)
        h = nn.gelu(h, approximate=approximate)
        return h @ w2 + b2.astype(cd)

    def test_fp32_uses_exact_erf(self, rng):
        from btia_tpu.core.dtypes import FP32_POLICY

        x = jnp.asarray(rng.randn(6, 64), jnp.float32)
        out, vars_, _ = self._apply(FP32_POLICY, x, rng)
        erf = self._manual(vars_, x, FP32_POLICY, approximate=False)
        tanh = self._manual(vars_, x, FP32_POLICY, approximate=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(erf), atol=1e-5)
        # the two flavors are distinguishable at fp32 — the assert means something
        assert np.abs(np.asarray(erf) - np.asarray(tanh)).max() > 1e-6

    def test_bf16_uses_tanh_approx(self, rng):
        from btia_tpu.core.dtypes import BF16_POLICY

        x = jnp.asarray(rng.randn(6, 64), jnp.bfloat16)
        out, vars_, _ = self._apply(BF16_POLICY, x, rng)
        tanh = self._manual(vars_, x, BF16_POLICY, approximate=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(tanh, np.float32), atol=1e-5
        )
