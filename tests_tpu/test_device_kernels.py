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
