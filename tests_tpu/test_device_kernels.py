"""Real-hardware equivalence for every Pallas kernel at its serving
shape: Mosaic compile + execute + bf16 agreement with the XLA oracle.
[SURVEY §4.2 'Perf' tier — hardware leg of the kernel rail.]
"""

import jax
import jax.numpy as jnp
import numpy as np


def _close(a, b, atol=0.08):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        atol=atol, rtol=0.05,
    )


def _bf16(rng, *shape):
    return jnp.asarray(rng.randn(*shape), jnp.bfloat16)


class TestFanoutOnDevice:
    def test_serving_shape(self, rng):
        from btia_tpu.ops.attention import _fanout_mha, mha_reference

        B, Sq, Sk, H, D = 256, 32, 32, 12, 64
        q, k, v = (_bf16(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = jax.jit(
            lambda q, k, v: _fanout_mha(
                q, k, v, mask.astype(jnp.float32), H, False
            )
        )(q, k, v)
        t = lambda x, s: x.reshape(B, s, H, D).transpose(0, 2, 1, 3)
        ref = mha_reference(t(q, Sq), t(k, Sk), t(v, Sk), mask)
        _close(out, ref.transpose(0, 2, 1, 3).reshape(B, Sq, H * D))


class TestBshdFlashOnDevice:
    def test_vitl_shape(self, rng):
        """ViT-L/336: 577 tokens, 16 heads, exact-fit q tile — the shape
        whose deferred-division variant overflowed scoped VMEM."""
        from btia_tpu.ops.attention import _bshd_mha, mha_reference

        B, S, H, D = 2, 577, 16, 64
        q, k, v = (_bf16(rng, B, S, H * D) for _ in range(3))
        out = jax.jit(lambda q, k, v: _bshd_mha(q, k, v, None, H, False))(
            q, k, v
        )
        t = lambda x: x.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        ref = mha_reference(t(q), t(k), t(v), None)
        _close(out, ref.transpose(0, 2, 1, 3).reshape(B, S, H * D))


class TestFusedDenseOnDevice:
    def _params(self, rng, din, hd, dout):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        return [mk(din, hd), mk(hd), mk(din, hd), mk(hd), mk(din, hd),
                mk(hd), mk(hd, dout), mk(dout)]

    def test_bert_site(self, rng):
        from btia_tpu.ops.fused_attn import _fused, _unfused

        B, Sq, Sk, H, D, Din = 256, 32, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        x = _bf16(rng, B, Sq, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = jax.jit(lambda x: _fused(x, x, mask, *p, H, False))(x)
        ref = _unfused(x, x, mask, *p, num_heads=H)
        _close(out, ref)

    def test_cross_site(self, rng):
        from btia_tpu.ops.fused_attn import _fused, _unfused

        B, Sq, Sk, H, D, Din = 256, 50, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        xq, xkv = _bf16(rng, B, Sq, Din), _bf16(rng, B, Sk, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = jax.jit(lambda a, b: _fused(a, b, mask, *p, H, False))(xq, xkv)
        ref = _unfused(xq, xkv, mask, *p, num_heads=H)
        _close(out, ref)

    def test_static_q_site(self, rng):
        from btia_tpu.ops.fused_attn import _staticq, _staticq_unfused

        B, K, Sk, H, D, Din = 256, 64, 82, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        qs = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = _bf16(rng, B, Sk, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = jax.jit(lambda t: _staticq(qs, t, mask, *p, H, False))(xkv)
        ref = _staticq_unfused(qs, xkv, mask, *p, num_heads=H)
        _close(out, ref)


class TestFusedMeshOnDevice:
    """The multi-chip fused road, on real hardware: fused_mesh() wraps the
    Pallas custom call in shard_map — on a 1-device ('data','model') mesh
    the per-rank program is EXACTLY what each chip of a slice runs, so
    this proves the shard_map-wrapped Mosaic kernel compiles + executes
    on device [VERDICT r3 #3]."""

    def _params(self, rng, din, hd, dout):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        return [mk(din, hd), mk(hd), mk(din, hd), mk(hd), mk(din, hd),
                mk(hd), mk(hd, dout), mk(dout)]

    def test_fused_inside_shardmap(self, rng):
        from btia_tpu.ops import fused_attn as FA
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh

        B, Sq, Sk, H, D, Din = 256, 32, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        x = _bf16(rng, B, Sq, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        mesh = make_mesh(MeshConfig(1, 1), devices=jax.devices()[:1])

        def f(x):
            with FA.fused_mesh(mesh):
                return FA._fused_over_mesh(
                    x, x, mask, *p, H, False, mesh, 1
                )

        out = jax.jit(f)(x)
        ref = FA._unfused(x, x, mask, *p, num_heads=H)
        _close(out, ref)

    def test_fused_vjp_on_device(self, rng):
        """The fused custom_vjp's backward on hardware — the TPU training
        step's actual backward road [VERDICT r3 #4]. Compared under an
        IDENTICAL cotangent: the fused bwd rematerializes through the
        unfused graph, so with the same cotangent the two vjps must agree
        tightly (a grad-of-squared-loss comparison instead amplifies the
        bf16 forward-output difference through the cotangent — first run
        of this test failed exactly that way; math equivalence is already
        pinned in fp32 on CPU, tests/test_ops.py)."""
        from btia_tpu.ops.fused_attn import _fused, _unfused

        B, Sq, Sk, H, D, Din = 256, 32, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        x = _bf16(rng, B, Sq, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        g = _bf16(rng, B, Sq, Din)  # fixed cotangent

        def f_fused(x, wq, bo):
            a = [wq] + p[1:7] + [bo]
            return _fused(x, x, mask, *a, H, False)

        def f_ref(x, wq, bo):
            a = [wq] + p[1:7] + [bo]
            return _unfused(x, x, mask, *a, num_heads=H)

        def grads(f):
            def run(x, wq, bo, g):
                _, vjp = jax.vjp(f, x, wq, bo)
                return vjp(g)

            return jax.jit(run)(x, p[0], p[7], g)

        for a, b in zip(grads(f_fused), grads(f_ref)):
            _close(a, b)


class TestBicrossOnDevice:
    def test_fused_bidirectional(self, rng):
        from btia_tpu.ops.bicross import bicross_attention, bicross_reference

        B, H, Ni, Nt, D = 2, 8, 196, 32, 64
        mk = lambda n: _bf16(rng, B, H, n, D)
        qi, ki, vi = mk(Ni), mk(Ni), mk(Ni)
        qt, kt, vt = mk(Nt), mk(Nt), mk(Nt)
        mask = jnp.asarray(rng.rand(B, Nt) > 0.3).at[:, 0].set(True)
        oi, ot = jax.jit(
            lambda *a: bicross_attention(*a, mask, impl="pallas")
        )(qi, ki, vi, qt, kt, vt)
        ri, rt = bicross_reference(qi, ki, vi, qt, kt, vt, mask)
        _close(oi, ri)
        _close(ot, rt)


class TestSiteFusionOnDevice:
    """Site-fused kernels (prologue LN / epilogue residual+post-LN inside
    the kernel, SiteCfg) at their real serving shapes — Mosaic compile +
    execute + agreement with the unfused site composition. The f32 row-LN
    stages add VMEM pressure interpret mode can't measure."""

    def _params(self, rng, din, hd, dout):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        return [mk(din, hd), mk(hd), mk(din, hd), mk(hd), mk(din, hd),
                mk(hd), mk(hd, dout), mk(dout)]

    def _lns(self, rng, d):
        return (
            jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32),
            jnp.asarray(0.1 * rng.randn(d), jnp.float32),
        )

    def test_btia_order(self, rng):
        """BTIA direction: pre-LN both streams + residual (50×32 cross)."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 256, 50, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        xq, xkv = _bf16(rng, B, Sq, Din), _bf16(rng, B, Sk, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        qs, qb = self._lns(rng, Din)
        ks, kb = self._lns(rng, Din)
        d = FA._ln_dummy()
        site = FA.SiteCfg(q_ln_eps=1e-6, kv_ln_eps=1e-6, residual=True)
        out = jax.jit(
            lambda a, b: FA._fused_site(
                a, b, mask, *p, qs, qb, ks, kb, d, d, H, False, site
            )
        )(xq, xkv)
        ref = FA._unfused_site(
            xq, xkv, mask, *p, qs, qb, ks, kb, d, d, num_heads=H, site=site
        )
        _close(out, ref)

    def test_bert_order(self, rng):
        """BERT self-attention: residual + post-LN (eps 1e-12) epilogue."""
        from btia_tpu.ops import fused_attn as FA

        B, S, H, D, Din = 256, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        x = _bf16(rng, B, S, Din)
        mask = jnp.asarray(rng.rand(B, S) > 0.3).at[:, 0].set(True)
        ps, pb = self._lns(rng, Din)
        d = FA._ln_dummy()
        site = FA.SiteCfg(residual=True, post_ln_eps=1e-12)
        out = jax.jit(
            lambda x: FA._fused_site(
                x, x, mask, *p, d, d, d, d, ps, pb, H, False, site
            )
        )(x)
        ref = FA._unfused_site(
            x, x, mask, *p, d, d, d, d, ps, pb, num_heads=H, site=site
        )
        _close(out, ref)

    def test_staticq_ad_head(self, rng):
        """AD head: kv pre-LN + query-table residual at the fan-out shape
        (bb=2 packing default)."""
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 256, 64, 82, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        qs_tab = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = _bf16(rng, B, Sk, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ks, kb = self._lns(rng, Din)
        site = FA.SiteCfg(kv_ln_eps=1e-6, residual=True)
        out = jax.jit(
            lambda t: FA._staticq_site(
                qs_tab, t, mask, *p, ks, kb, H, False, site
            )
        )(xkv)
        ref = FA._staticq_unfused_site(
            qs_tab, xkv, mask, *p, ks, kb, num_heads=H, site=site
        )
        _close(out, ref)

    def test_site_vjp_on_device(self, rng):
        """Site-fused custom_vjp backward on hardware under an identical
        cotangent (see TestFusedMeshOnDevice.test_fused_vjp_on_device for
        the comparison protocol)."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 256, 32, 32, 12, 64, 768
        p = self._params(rng, Din, H * D, Din)
        x = _bf16(rng, B, Sq, Din)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        qs, qb = self._lns(rng, Din)
        d = FA._ln_dummy()
        site = FA.SiteCfg(q_ln_eps=1e-6, residual=True)
        g = _bf16(rng, B, Sq, Din)

        def f_fused(x, s_q):
            return FA._fused_site(
                x, x, mask, *p, s_q, qb, d, d, d, d, H, False, site
            )

        def f_ref(x, s_q):
            return FA._unfused_site(
                x, x, mask, *p, s_q, qb, d, d, d, d, num_heads=H, site=site
            )

        def grads(f):
            def run(x, s_q, g):
                _, vjp = jax.vjp(f, x, s_q)
                return vjp(g)

            return jax.jit(run)(x, qs, g)

        for a, b in zip(grads(f_fused), grads(f_ref)):
            _close(a, b)


class TestQuantLnOnDevice:
    """The remaining Pallas kernels — the int8 fused-epilogue matmul
    (serving int8 path, ops/quant.py) and the single-pass LayerNorm
    (ops/norms.py, kept as a tested alternative) — compile + run on
    hardware at serving-scale shapes."""

    def test_int8_matmul_gelu_epilogue(self, rng):
        import functools

        import flax.linen as nn

        from btia_tpu.ops.quant import (
            int8_matmul_fused,
            int8_matmul_fused_reference,
            quantize_weight,
        )

        M, K, N = 4096, 768, 3072  # the serving Mlp fc1 shape class
        x = _bf16(rng, M, K)
        w = jnp.asarray(rng.randn(K, N) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(N) * 0.1, jnp.float32)
        w_i8, w_scale = quantize_weight(w)
        act = functools.partial(nn.gelu, approximate=True)
        out = jax.jit(
            lambda x: int8_matmul_fused(
                x, w_i8, w_scale, bias, act=act, interpret=False
            )
        )(x)
        ref = int8_matmul_fused_reference(x, w_i8, w_scale, bias, act=act)
        _close(out, ref, atol=0.15)

    def test_layernorm_single_pass(self, rng):
        from btia_tpu.ops.norms import _layernorm_pallas, _ln_exact

        x = _bf16(rng, 4096, 768)
        s = jnp.asarray(1.0 + 0.1 * rng.randn(768), jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(768), jnp.float32)
        out = jax.jit(
            lambda x: _layernorm_pallas(x, s, b, 1e-6, interpret=False)
        )(x)
        ref = _ln_exact(x, s, b, 1e-6)
        _close(out, ref)
