"""Pallas kernels vs XLA references, interpret mode on CPU [SURVEY §4.2]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btia_tpu.ops.attention import _fanout_mha, mha, mha_reference
from btia_tpu.ops.bicross import bicross_attention, bicross_reference
from btia_tpu.ops.ingest import (
    normalize_images,
    preprocess_images,
    resize_bilinear,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape), jnp.float32)


class TestMHA:
    def test_pallas_matches_reference(self, rng):
        B, H, Sq, Sk, D = 2, 3, 17, 23, 32
        q, k, v = _rand(rng, B, H, Sq, D), _rand(rng, B, H, Sk, D), _rand(rng, B, H, Sk, D)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3)
        ref = mha_reference(q, k, v, mask)
        pal = mha(q, k, v, mask, impl="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-5)

    def test_no_mask(self, rng):
        q, k, v = (_rand(rng, 1, 2, 9, 16) for _ in range(3))
        ref = mha_reference(q, k, v)
        pal = mha(q, k, v, impl="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-5)

    def test_bf16(self, rng):
        q, k, v = (
            _rand(rng, 1, 2, 12, 32).astype(jnp.bfloat16) for _ in range(3)
        )
        ref = mha_reference(q, k, v)
        pal = mha(q, k, v, impl="pallas", interpret=True)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(pal, np.float32), atol=2e-2
        )

    def test_gradients_match_reference(self, rng):
        B, H, Sq, Sk, D = 1, 2, 7, 11, 16
        q, k, v = _rand(rng, B, H, Sq, D), _rand(rng, B, H, Sk, D), _rand(rng, B, H, Sk, D)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3)

        def loss_custom(q, k, v):
            return jnp.sum(mha(q, k, v, mask, impl="xla") ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, mask) ** 2)

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gc, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_packed_impl_matches_reference(self, rng):
        B, H, Sq, Sk, D = 2, 4, 7, 11, 16
        q, k, v = _rand(rng, B, H, Sq, D), _rand(rng, B, H, Sk, D), _rand(rng, B, H, Sk, D)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3)
        ref = mha_reference(q, k, v, mask)
        packed = mha(q, k, v, mask, impl="packed")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(packed), atol=1e-5)

    def test_fully_masked_rows_do_not_nan(self, rng):
        q, k, v = (_rand(rng, 1, 1, 4, 8) for _ in range(3))
        mask = jnp.zeros((1, 4), bool).at[:, 0].set(True)
        out = mha(q, k, v, mask, impl="xla")
        assert bool(jnp.isfinite(out).all())


class TestFanoutMHA:
    """Batch-blocked fan-out kernel (serving hot path) vs reference."""

    def _ref_packed(self, q, k, v, mask, H):
        B, Sq, HD = q.shape
        Sk = k.shape[1]
        D = HD // H
        t = lambda x, s: x.reshape(B, s, H, D).transpose(0, 2, 1, 3)
        out = mha_reference(t(q, Sq), t(k, Sk), t(v, Sk), mask)
        return out.transpose(0, 2, 1, 3).reshape(B, Sq, HD)

    @pytest.mark.parametrize(
        "B,Sq,Sk,H,D",
        [
            (128, 32, 32, 12, 64),  # BERT fan-out self-attention
            (100, 50, 32, 12, 64),  # BTIA img→txt (batch pads to block)
            (64, 32, 50, 12, 64),  # BTIA txt→img
            (70, 64, 82, 12, 64),  # AD head over fused tokens
        ],
    )
    def test_matches_reference(self, rng, B, Sq, Sk, H, D):
        q, k, v = (
            _rand(rng, B, s, H * D) for s in (Sq, Sk, Sk)
        )
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = _fanout_mha(q, k, v, mask.astype(jnp.float32), H, True)
        ref = self._ref_packed(q, k, v, mask, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self, rng):
        B, Sq, Sk, H, D = 8, 16, 12, 4, 64
        q, k, v = (_rand(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)

        def loss_ker(q, k, v):
            out = _fanout_mha(q, k, v, mask.astype(jnp.float32), H, True)
            return jnp.sum(out**2)

        def loss_ref(q, k, v):
            return jnp.sum(self._ref_packed(q, k, v, mask, H) ** 2)

        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_fully_masked_row_is_finite(self, rng):
        B, Sq, Sk, H, D = 8, 8, 8, 2, 64
        q, k, v = (_rand(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.zeros((B, Sk), jnp.float32)  # every key padded
        out = _fanout_mha(q, k, v, mask, H, True)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.parametrize("g", [2, 4])
    @pytest.mark.parametrize("B", [128, 100])  # 100: pads to the g·bb grid
    def test_grid_blocked_matches_reference(self, rng, g, B):
        """_FANOUT_G > 1 (several bb-blocks per grid program) is a pure
        scheduling change — results must be bit-compatible with g=1's
        math (both compared to the packed reference)."""
        from btia_tpu.ops import attention as A

        Sq, Sk, H, D = 32, 32, 4, 64
        q, k, v = (_rand(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        old = A._FANOUT_G
        try:
            A._FANOUT_G = g
            out = _fanout_mha(q, k, v, mask.astype(jnp.float32), H, True)
        finally:
            A._FANOUT_G = old
        ref = self._ref_packed(q, k, v, mask, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("pack", [128, 512])
    def test_pack_target_matches_reference(self, rng, pack):
        """_FANOUT_PACK (the bb row-packing target) is a pure scheduling
        knob — any value must reproduce the packed reference."""
        from btia_tpu.ops import attention as A

        B, Sq, Sk, H, D = 64, 32, 24, 4, 64
        q, k, v = (_rand(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        old = A._FANOUT_PACK
        try:
            A._FANOUT_PACK = pack
            out = _fanout_mha(q, k, v, mask.astype(jnp.float32), H, True)
        finally:
            A._FANOUT_PACK = old
        ref = self._ref_packed(q, k, v, mask, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestBshdFlash:
    """Head-pad-free long-seq kernel (projection-native (B,S,H*D) layout,
    VERDICT r2 #4 'layout copies/pads' residual) vs reference."""

    def _ref_packed(self, q, k, v, mask, H):
        B, Sq, HD = q.shape
        Sk = k.shape[1]
        D = HD // H
        t = lambda x, s: x.reshape(B, s, H, D).transpose(0, 2, 1, 3)
        out = mha_reference(t(q, Sq), t(k, Sk), t(v, Sk), mask)
        return out.transpose(0, 2, 1, 3).reshape(B, Sq, HD)

    @pytest.mark.parametrize(
        "B,Sq,Sk,H,D",
        [
            (2, 577, 577, 16, 64),  # ViT-L/336 self-attention (the target)
            (2, 197, 197, 12, 64),  # ViT-B/16 self-attention
            (1, 300, 140, 4, 64),  # ragged seqs: q-tile + Sk lane padding
        ],
    )
    def test_matches_reference(self, rng, B, Sq, Sk, H, D):
        from btia_tpu.ops.attention import _bshd_mha

        q, k, v = (_rand(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = _bshd_mha(q, k, v, mask, H, True)
        ref = self._ref_packed(q, k, v, mask, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_no_mask_matches_reference(self, rng):
        from btia_tpu.ops.attention import _bshd_mha

        B, S, H, D = 2, 260, 4, 64
        q, k, v = (_rand(rng, B, S, H * D) for _ in range(3))
        out = _bshd_mha(q, k, v, None, H, True)
        ref = self._ref_packed(q, k, v, None, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self, rng):
        from btia_tpu.ops.attention import _bshd_mha

        B, S, H, D = 1, 300, 4, 64
        q, k, v = (
            _rand(rng, B, S, H * D).astype(jnp.bfloat16) for _ in range(3)
        )
        out = _bshd_mha(q, k, v, None, H, True)
        ref = self._ref_packed(q, k, v, None, H)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_gradients_match_reference(self, rng):
        from btia_tpu.ops.attention import _bshd_mha

        B, Sq, Sk, H, D = 1, 96, 72, 2, 64
        q, k, v = (_rand(rng, B, s, H * D) for s in (Sq, Sk, Sk))
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)

        def loss_ker(q, k, v):
            return jnp.sum(_bshd_mha(q, k, v, mask, H, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(self._ref_packed(q, k, v, mask, H) ** 2)

        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestBicross:
    def test_matches_reference(self, rng):
        B, H, Ni, Nt, D = 2, 2, 13, 9, 32
        qi, ki, vi = (_rand(rng, B, H, Ni, D) for _ in range(3))
        qt, kt, vt = (_rand(rng, B, H, Nt, D) for _ in range(3))
        mask = jnp.asarray(rng.rand(B, Nt) > 0.3)
        ri, rt = bicross_reference(qi, ki, vi, qt, kt, vt, mask)
        pi, pt = bicross_attention(
            qi, ki, vi, qt, kt, vt, mask, impl="pallas", interpret=True
        )
        np.testing.assert_allclose(np.asarray(ri), np.asarray(pi), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rt), np.asarray(pt), atol=1e-4)

    def test_grads_finite(self, rng):
        B, H, Ni, Nt, D = 1, 2, 5, 4, 16
        qi, ki, vi = (_rand(rng, B, H, Ni, D) for _ in range(3))
        qt, kt, vt = (_rand(rng, B, H, Nt, D) for _ in range(3))

        def loss(*args):
            oi, ot = bicross_attention(*args, impl="xla")
            return jnp.sum(oi**2) + jnp.sum(ot**2)

        grads = jax.grad(loss, argnums=tuple(range(6)))(qi, ki, vi, qt, kt, vt)
        for g in grads:
            assert bool(jnp.isfinite(g).all())


class TestBshdLayout:
    def test_mha_bshd_matches_bhsd(self, rng):
        B, H, Sq, Sk, D = 2, 3, 9, 13, 16
        q = jnp.asarray(rng.randn(B, Sq, H, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, Sk, H, D), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3)
        from btia_tpu.ops.attention import mha_bshd

        t = lambda x: x.transpose(0, 2, 1, 3)
        ref = t(mha_reference(t(q), t(k), t(v), mask))
        out = mha_bshd(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)

    def test_bicross_bshd_matches_reference(self, rng):
        from btia_tpu.ops.bicross import bicross_bshd

        B, H, Ni, Nt, D = 2, 2, 7, 5, 16
        mk = lambda s: jnp.asarray(rng.randn(B, s, H, D), jnp.float32)
        qi, ki, vi = mk(Ni), mk(Ni), mk(Ni)
        qt, kt, vt = mk(Nt), mk(Nt), mk(Nt)
        mask = jnp.asarray(rng.rand(B, Nt) > 0.3)
        t = lambda x: x.transpose(0, 2, 1, 3)
        ri, rt = bicross_reference(
            t(qi), t(ki), t(vi), t(qt), t(kt), t(vt), mask
        )
        oi, ot = bicross_bshd(qi, ki, vi, qt, kt, vt, mask)
        np.testing.assert_allclose(np.asarray(t(ri)), np.asarray(oi), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t(rt)), np.asarray(ot), atol=1e-5)


class TestIngest:
    def test_resize_identity(self, rng):
        img = jnp.asarray(rng.randint(0, 255, (1, 16, 16, 3)), jnp.uint8)
        out = resize_bilinear(img, (16, 16))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img, np.float32), atol=1e-5
        )

    def test_resize_matches_torch_convention(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = rng.rand(2, 31, 45, 3).astype(np.float32) * 255
        ours = np.asarray(resize_bilinear(jnp.asarray(img), (24, 24)))
        t = torch.from_numpy(img).permute(0, 3, 1, 2)
        theirs = (
            F.interpolate(t, size=(24, 24), mode="bilinear", align_corners=False)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-3)

    def test_normalize(self):
        x = jnp.full((1, 2, 2, 3), 127.5)
        out = normalize_images(x)
        expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 0], expected, atol=1e-3
        )

    def test_preprocess_jits(self, rng):
        imgs = jnp.asarray(rng.randint(0, 255, (2, 48, 48, 3)), jnp.uint8)
        out = jax.jit(lambda x: preprocess_images(x, (32, 32)))(imgs)
        assert out.shape == (2, 32, 32, 3)
        assert bool(jnp.isfinite(out).all())


class TestFusedDenseAttention:
    """ops/fused_attn.py: ONE Pallas kernel for qkv-proj → attention →
    out-proj (the serving fan-out path) vs the unfused XLA reference."""

    def _params(self, rng, din, hd, dout):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        return dict(
            wq=mk(din, hd), bq=mk(hd), wk=mk(din, hd), bk=mk(hd),
            wv=mk(din, hd), bv=mk(hd), wo=mk(hd, dout), bo=mk(dout),
        )

    @pytest.mark.parametrize("B,Sq,Sk", [(64, 32, 32), (100, 50, 32)])
    def test_matches_unfused(self, rng, B, Sq, Sk):
        from btia_tpu.ops.fused_attn import _fused, _unfused

        H, D, Din = 4, 64, 256
        p = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        args = [p[k] for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")]
        out = _fused(x_q, x_kv, mask, *args, 4, True)
        ref = _unfused(x_q, x_kv, mask, *args, num_heads=4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4
        )

    def test_no_mask_matches(self, rng):
        from btia_tpu.ops.fused_attn import _fused, _unfused

        B, Sq, Sk, H, D, Din = 64, 32, 32, 4, 64, 256
        p = self._params(rng, Din, H * D, Din)
        x = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        args = [p[k] for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")]
        out = _fused(x, x, None, *args, 4, True)
        ref = _unfused(x, x, None, *args, num_heads=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_gradients_match_unfused(self, rng):
        """The vjp rematerialises through the unfused XLA graph — grads
        must agree with differentiating the unfused path directly."""
        from btia_tpu.ops.fused_attn import _fused, _unfused

        B, Sq, Sk, H, D, Din = 64, 16, 16, 2, 64, 128
        p = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        args = [p[k] for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")]

        def loss_f(xq, *ps):
            return jnp.sum(_fused(xq, x_kv, mask, *ps, 2, True) ** 2)

        def loss_r(xq, *ps):
            return jnp.sum(_unfused(xq, x_kv, mask, *ps, num_heads=2) ** 2)

        gf = jax.grad(loss_f, argnums=(0, 1, 7))(x_q, *args)
        gr = jax.grad(loss_r, argnums=(0, 1, 7))(x_q, *args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
            )

    def test_module_routes_and_matches(self, rng):
        """MultiHeadAttention (which owns the params) produces identical
        results whether fused_dense_attention routes fused or unfused."""
        import flax.linen as nn_  # noqa: F401
        from btia_tpu.core.dtypes import FP32_POLICY
        from btia_tpu.models.layers import MultiHeadAttention
        from btia_tpu.ops import fused_attn as FA

        B, S, Din = 64, 32, 128
        mod = MultiHeadAttention(128, 2, FP32_POLICY)
        x = jnp.asarray(rng.randn(B, S, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, S) > 0.3).at[:, 0].set(True)
        variables = mod.init(jax.random.PRNGKey(0), x, kv_mask=mask)
        ref = mod.apply(variables, x, kv_mask=mask)  # CPU → unfused
        # Force the fused kernel (interpret) through the same module params
        p = variables["params"]
        out = FA._fused(
            x, x, mask,
            p["q_proj"]["kernel"], p["q_proj"]["bias"],
            p["k_proj"]["kernel"], p["k_proj"]["bias"],
            p["v_proj"]["kernel"], p["v_proj"]["bias"],
            p["o_proj"]["kernel"], p["o_proj"]["bias"],
            2, True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_bf16_matches_unfused(self, rng):
        """Serving dtype: fused bf16 path vs unfused bf16 reference."""
        from btia_tpu.ops.fused_attn import _fused, _unfused

        B, Sq, Sk, H, D, Din = 64, 32, 32, 4, 64, 256
        p = self._params(rng, Din, H * D, Din)
        x = jnp.asarray(rng.randn(B, Sq, Din), jnp.bfloat16)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        args = [p[k] for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")]
        out = _fused(x, x, mask, *args, 4, True)
        ref = _unfused(x, x, mask, *args, num_heads=4)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.08, rtol=0.05,
        )

    def test_staticq_matches_unfused(self, rng):
        from btia_tpu.ops.fused_attn import _staticq, _staticq_unfused

        B, K, Sk, H, D, Din = 64, 16, 24, 2, 64, 128
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        args = [mk(Din, H * D), mk(H * D), mk(Din, H * D), mk(H * D),
                mk(Din, H * D), mk(H * D), mk(H * D, Din), mk(Din)]
        qs = mk(K, Din)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        out = _staticq(qs, xkv, mask, *args, 2, True)
        ref = _staticq_unfused(qs, xkv, mask, *args, num_heads=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    @pytest.mark.parametrize("bb", [2, 4])
    def test_staticq_bb_packing_matches(self, rng, bb, monkeypatch):
        """bb-packed static-q kernel (block-diagonal batch packing, full
        MXU rows — VERDICT r3 #7 A/B) ≡ bb=1, incl. a non-divisible B
        (padding path)."""
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 6, 16, 24, 2, 64, 128
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        args = [mk(Din, H * D), mk(H * D), mk(Din, H * D), mk(H * D),
                mk(Din, H * D), mk(H * D), mk(H * D, Din), mk(Din)]
        qs = mk(K, Din)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ref = FA._staticq_unfused(qs, xkv, mask, *args, num_heads=H)
        monkeypatch.setattr(FA, "_STATICQ_BB", bb)
        out = FA._staticq(qs, xkv, mask, *args, H, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_staticq_gradients_match_unfused(self, rng):
        from btia_tpu.ops.fused_attn import _staticq, _staticq_unfused

        B, K, Sk, H, D, Din = 64, 8, 16, 2, 64, 128
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        args = [mk(Din, H * D), mk(H * D), mk(Din, H * D), mk(H * D),
                mk(Din, H * D), mk(H * D), mk(H * D, Din), mk(Din)]
        qs = mk(K, Din)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)

        def loss_f(q, xk, *ps):
            return jnp.sum(_staticq(q, xk, mask, *ps, 2, True) ** 2)

        def loss_r(q, xk, *ps):
            return jnp.sum(_staticq_unfused(q, xk, mask, *ps, num_heads=2) ** 2)

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(qs, xkv, *args)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(qs, xkv, *args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
            )

    def test_disable_fused_context(self, rng, monkeypatch):
        """disable_fused() must route even interpret-capable shapes through
        the unfused road — the context is authoritative over interpret=True
        (ADVICE r3: the old gate let `or interpret` override it). Asserts
        actual ROUTING, not just the flag."""
        from btia_tpu.ops import fused_attn as FA

        B, S, H, D, Din = 64, 16, 2, 64, 128
        p = self._params(rng, Din, H * D, Din)
        x = jnp.asarray(rng.randn(B, S, Din), jnp.float32)
        args = [p[k] for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")]
        calls = []
        real_fused, real_unfused = FA._fused, FA._unfused
        monkeypatch.setattr(
            FA, "_fused",
            lambda *a, **k: calls.append("fused") or real_fused(*a, **k),
        )
        monkeypatch.setattr(
            FA, "_unfused",
            lambda *a, **k: calls.append("unfused") or real_unfused(*a, **k),
        )
        with FA.disable_fused():
            assert not FA._ENABLED
            FA.fused_dense_attention(x, x, None, *args, H, interpret=True)
        assert calls == ["unfused"], calls
        calls.clear()
        FA.fused_dense_attention(x, x, None, *args, H, interpret=True)
        assert calls == ["fused"], calls
        assert FA._ENABLED

    def test_staticq_disable_fused_routing(self, rng, monkeypatch):
        """Same authority check for the static-q (AD head) entry point."""
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 64, 8, 16, 2, 64, 128
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        args = [mk(Din, H * D), mk(H * D), mk(Din, H * D), mk(H * D),
                mk(Din, H * D), mk(H * D), mk(H * D, Din), mk(Din)]
        qs = mk(K, Din)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        calls = []
        real_f, real_u = FA._staticq, FA._staticq_unfused
        monkeypatch.setattr(
            FA, "_staticq",
            lambda *a, **k: calls.append("fused") or real_f(*a, **k),
        )
        monkeypatch.setattr(
            FA, "_staticq_unfused",
            lambda *a, **k: calls.append("unfused") or real_u(*a, **k),
        )
        with FA.disable_fused():
            FA.fused_static_q_attention(qs, xkv, None, *args, H, interpret=True)
        assert calls == ["unfused"], calls
        calls.clear()
        FA.fused_static_q_attention(qs, xkv, None, *args, H, interpret=True)
        assert calls == ["fused"], calls

    def test_kv_feature_dim_gates_fused(self, rng, monkeypatch):
        """Cross-attention whose KV stream feature dim is NOT lane-aligned
        must route unfused even when the q stream's is (ADVICE r3: only
        wq.shape[0] was checked; a misaligned k/v projection operand is a
        hardware compile/perf failure class)."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D = 64, 16, 12, 2, 64
        Din_q, Din_kv = 128, 96  # kv stream NOT a lane multiple
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        args = [mk(Din_q, H * D), mk(H * D), mk(Din_kv, H * D), mk(H * D),
                mk(Din_kv, H * D), mk(H * D), mk(H * D, Din_q), mk(Din_q)]
        x_q = jnp.asarray(rng.randn(B, Sq, Din_q), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din_kv), jnp.float32)
        calls = []
        real_u = FA._unfused
        monkeypatch.setattr(
            FA, "_unfused",
            lambda *a, **k: calls.append("unfused") or real_u(*a, **k),
        )
        monkeypatch.setattr(FA, "_resolved_impl", lambda: "pallas")
        FA.fused_dense_attention(x_q, x_kv, None, *args, H)
        assert calls == ["unfused"], calls


class TestFusedMesh:
    """Fused kernels under fused_mesh(mesh): the shard_map-partitioned
    road (batch over 'data', heads over 'model', psum'd output projection)
    must equal the single-device unfused reference — forward AND backward
    — on the virtual 8-device mesh [VERDICT r3 #3]."""

    def _mesh(self, data, model):
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh

        return make_mesh(MeshConfig(data=data, model=model))

    def _params(self, rng, din_q, hd, dout, din_kv=None):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        din_kv = din_kv or din_q
        return [mk(din_q, hd), mk(hd), mk(din_kv, hd), mk(hd),
                mk(din_kv, hd), mk(hd), mk(hd, dout), mk(dout)]

    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
    def test_dense_matches_unfused(self, rng, dp, tp):
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 16, 12, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ref = FA._unfused(x_q, x_kv, mask, *args, num_heads=H)
        with FA.fused_mesh(self._mesh(dp, tp)):
            out = FA.fused_dense_attention(
                x_q, x_kv, mask, *args, H, interpret=True
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-4
        )

    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
    def test_staticq_matches_unfused(self, rng, dp, tp):
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 64, 16, 24, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        qs = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ref = FA._staticq_unfused(qs, xkv, mask, *args, num_heads=H)
        with FA.fused_mesh(self._mesh(dp, tp)):
            out = FA.fused_static_q_attention(
                qs, xkv, mask, *args, H, interpret=True
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-4
        )

    def test_gradients_match_unfused(self, rng):
        """jax.grad through the shard_map-wrapped custom_vjp (DP4×TP2):
        the multi-device train step's actual backward road."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 8, 8, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        mesh = self._mesh(4, 2)

        def loss_mesh(xq, wq, bo):
            a = [wq] + args[1:7] + [bo]
            with FA.fused_mesh(mesh):
                return jnp.sum(
                    FA.fused_dense_attention(
                        xq, x_kv, mask, *a, H, interpret=True
                    )
                    ** 2
                )

        def loss_ref(xq, wq, bo):
            a = [wq] + args[1:7] + [bo]
            return jnp.sum(FA._unfused(xq, x_kv, mask, *a, num_heads=H) ** 2)

        gm = jax.grad(loss_mesh, argnums=(0, 1, 2))(x_q, args[0], args[7])
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, args[0], args[7])
        for a, b in zip(gm, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
            )

    def test_undivisible_batch_routes_unfused(self, rng, monkeypatch):
        """B not divisible by the data axis → the unfused road (which pjit
        partitions natively), never a broken shard decomposition."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 66, 8, 8, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        calls = []
        real_u = FA._unfused
        monkeypatch.setattr(
            FA, "_unfused",
            lambda *a, **k: calls.append("unfused") or real_u(*a, **k),
        )
        with FA.fused_mesh(self._mesh(4, 2)):
            FA.fused_dense_attention(x, x, None, *args, H, interpret=True)
        assert calls == ["unfused"], calls


class TestSiteFusion:
    """SiteCfg fusion (ops/fused_attn.py): the surrounding block's
    pre-LNs, residual add, and post-LN fold INTO the fused kernels.
    The fused road (interpret) must equal the unfused site composition
    — which itself is the composition the modules historically spelled
    out (ops.norms.layernorm + residual in compute dtype) — forward AND
    backward, single device and under the mesh."""

    def _params(self, rng, din, hd, dout):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        return [mk(din, hd), mk(hd), mk(din, hd), mk(hd),
                mk(din, hd), mk(hd), mk(hd, dout), mk(dout)]

    def _lns(self, rng, d):
        s = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
        return s, b

    def test_btia_order_matches_unfused(self, rng):
        """Pre-LN on both streams + residual (BTIA block order)."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 16, 12, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        qs, qb = self._lns(rng, Din)
        ks, kb = self._lns(rng, Din)
        d = FA._ln_dummy()
        site = FA.SiteCfg(q_ln_eps=1e-6, kv_ln_eps=1e-6, residual=True)
        out = FA._fused_site(
            x_q, x_kv, mask, *args, qs, qb, ks, kb, d, d, H, True, site
        )
        ref = FA._unfused_site(
            x_q, x_kv, mask, *args, qs, qb, ks, kb, d, d,
            num_heads=H, site=site,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    def test_bert_order_matches_unfused(self, rng):
        """Residual + post-LN epilogue (BERT post-LN block order,
        eps 1e-12) on self-attention."""
        from btia_tpu.ops import fused_attn as FA

        B, S, H, D, Din = 64, 16, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x = jnp.asarray(rng.randn(B, S, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, S) > 0.3).at[:, 0].set(True)
        ps, pb = self._lns(rng, Din)
        d = FA._ln_dummy()
        site = FA.SiteCfg(residual=True, post_ln_eps=1e-12)
        out = FA._fused_site(
            x, x, mask, *args, d, d, d, d, ps, pb, H, True, site
        )
        ref = FA._unfused_site(
            x, x, mask, *args, d, d, d, d, ps, pb, num_heads=H, site=site
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    def test_site_gradients_match_unfused(self, rng):
        """Grads — including wrt the folded LN scale/bias — agree with
        differentiating the unfused site composition directly."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 8, 8, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        qs, qb = self._lns(rng, Din)
        ks, kb = self._lns(rng, Din)
        ps, pb = self._lns(rng, Din)
        site = FA.SiteCfg(
            q_ln_eps=1e-6, kv_ln_eps=1e-6, residual=True, post_ln_eps=1e-12
        )

        def loss_f(xq, wq, s_q, b_post):
            a = [wq] + args[1:]
            return jnp.sum(
                FA._fused_site(
                    xq, x_kv, mask, *a, s_q, qb, ks, kb, ps, b_post,
                    H, True, site
                ) ** 2
            )

        def loss_r(xq, wq, s_q, b_post):
            a = [wq] + args[1:]
            return jnp.sum(
                FA._unfused_site(
                    xq, x_kv, mask, *a, s_q, qb, ks, kb, ps, b_post,
                    num_heads=H, site=site,
                ) ** 2
            )

        gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(x_q, args[0], qs, pb)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x_q, args[0], qs, pb)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
            )

    def test_staticq_site_matches_unfused(self, rng):
        """AD-head order: kv pre-LN + query-table residual."""
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 64, 16, 24, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        qs_tab = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ks, kb = self._lns(rng, Din)
        site = FA.SiteCfg(kv_ln_eps=1e-6, residual=True)
        out = FA._staticq_site(
            qs_tab, xkv, mask, *args, ks, kb, H, True, site
        )
        ref = FA._staticq_unfused_site(
            qs_tab, xkv, mask, *args, ks, kb, num_heads=H, site=site
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    @pytest.mark.parametrize("bb", [2, 4])
    def test_staticq_site_bb_packing_matches(self, rng, bb, monkeypatch):
        """The packed (bb>1) static-q kernel applies the residual per
        packed batch element — incl. the non-divisible-B padding path."""
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 6, 16, 24, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        qs_tab = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ks, kb = self._lns(rng, Din)
        site = FA.SiteCfg(kv_ln_eps=1e-6, residual=True)
        ref = FA._staticq_unfused_site(
            qs_tab, xkv, mask, *args, ks, kb, num_heads=H, site=site
        )
        monkeypatch.setattr(FA, "_STATICQ_BB", bb)
        out = FA._staticq_site(
            qs_tab, xkv, mask, *args, ks, kb, H, True, site
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    def test_staticq_site_gradients_match_unfused(self, rng):
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 64, 8, 16, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        qs_tab = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ks, kb = self._lns(rng, Din)
        site = FA.SiteCfg(kv_ln_eps=1e-6, residual=True)

        def loss_f(q, xk, s_k):
            return jnp.sum(
                FA._staticq_site(
                    q, xk, mask, *args, s_k, kb, H, True, site
                ) ** 2
            )

        def loss_r(q, xk, s_k):
            return jnp.sum(
                FA._staticq_unfused_site(
                    q, xk, mask, *args, s_k, kb, num_heads=H, site=site
                ) ** 2
            )

        gf = jax.grad(loss_f, argnums=(0, 1, 2))(qs_tab, xkv, ks)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(qs_tab, xkv, ks)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
            )

    def test_bf16_site_matches_unfused(self, rng):
        """Serving dtype: full BTIA-order site fusion in bf16."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 16, 12, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.bfloat16)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.bfloat16)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        qs, qb = self._lns(rng, Din)
        ks, kb = self._lns(rng, Din)
        d = FA._ln_dummy()
        site = FA.SiteCfg(q_ln_eps=1e-6, kv_ln_eps=1e-6, residual=True)
        out = FA._fused_site(
            x_q, x_kv, mask, *args, qs, qb, ks, kb, d, d, H, True, site
        )
        ref = FA._unfused_site(
            x_q, x_kv, mask, *args, qs, qb, ks, kb, d, d,
            num_heads=H, site=site,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.08, rtol=0.05,
        )

    def test_wrapper_site_routing_equivalence(self, rng):
        """The public fused_dense_attention with site kwargs: the fused
        (interpret) and disable_fused() roads agree — wrapper plumbing of
        the LN operands is routing-independent."""
        from btia_tpu.ops import fused_attn as FA

        B, S, H, D, Din = 64, 16, 2, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x = jnp.asarray(rng.randn(B, S, Din), jnp.float32)
        qs, qb = self._lns(rng, Din)
        ps, pb = self._lns(rng, Din)
        kw = dict(
            q_ln=(qs, qb, 1e-6), residual=True, post_ln=(ps, pb, 1e-12)
        )
        out = FA.fused_dense_attention(x, x, None, *args, H, interpret=True, **kw)
        with FA.disable_fused():
            ref = FA.fused_dense_attention(x, x, None, *args, H, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


class TestSiteFusionMesh:
    """Site-fused kernels under fused_mesh: the TP>1 epilogue must apply
    AFTER the output-projection psum (kernel partials), matching the
    single-device unfused site composition."""

    def _mesh(self, data, model):
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh

        return make_mesh(MeshConfig(data=data, model=model))

    def _params(self, rng, din, hd, dout):
        mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
        return [mk(din, hd), mk(hd), mk(din, hd), mk(hd),
                mk(din, hd), mk(hd), mk(hd, dout), mk(dout)]

    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
    def test_dense_site_matches_unfused(self, rng, dp, tp):
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 16, 12, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        mk = lambda: (
            jnp.asarray(1.0 + 0.1 * rng.randn(Din), jnp.float32),
            jnp.asarray(0.1 * rng.randn(Din), jnp.float32),
        )
        qs, qb = mk()
        ks, kb = mk()
        ps, pb = mk()
        d = FA._ln_dummy()
        site = FA.SiteCfg(
            q_ln_eps=1e-6, kv_ln_eps=1e-6, residual=True, post_ln_eps=1e-12
        )
        ref = FA._unfused_site(
            x_q, x_kv, mask, *args, qs, qb, ks, kb, ps, pb,
            num_heads=H, site=site,
        )
        with FA.fused_mesh(self._mesh(dp, tp)):
            out = FA.fused_dense_attention(
                x_q, x_kv, mask, *args, H, interpret=True,
                q_ln=(qs, qb, 1e-6), kv_ln=(ks, kb, 1e-6),
                residual=True, post_ln=(ps, pb, 1e-12),
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
    def test_staticq_site_matches_unfused(self, rng, dp, tp):
        from btia_tpu.ops import fused_attn as FA

        B, K, Sk, H, D, Din = 64, 16, 24, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        qs_tab = jnp.asarray(rng.randn(K, Din) * 0.05, jnp.float32)
        xkv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        ks = jnp.asarray(1.0 + 0.1 * rng.randn(Din), jnp.float32)
        kb = jnp.asarray(0.1 * rng.randn(Din), jnp.float32)
        site = FA.SiteCfg(kv_ln_eps=1e-6, residual=True)
        ref = FA._staticq_unfused_site(
            qs_tab, xkv, mask, *args, ks, kb, num_heads=H, site=site
        )
        with FA.fused_mesh(self._mesh(dp, tp)):
            out = FA.fused_static_q_attention(
                qs_tab, xkv, mask, *args, H, interpret=True,
                kv_ln=(ks, kb, 1e-6), residual=True,
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    def test_dense_site_gradients_match(self, rng):
        """DP4×TP2 grads through the site-fused shard_map road, incl. the
        LN params — the multi-device train step's backward."""
        from btia_tpu.ops import fused_attn as FA

        B, Sq, Sk, H, D, Din = 64, 8, 8, 4, 64, 128
        args = self._params(rng, Din, H * D, Din)
        x_q = jnp.asarray(rng.randn(B, Sq, Din), jnp.float32)
        x_kv = jnp.asarray(rng.randn(B, Sk, Din), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.3).at[:, 0].set(True)
        qs = jnp.asarray(1.0 + 0.1 * rng.randn(Din), jnp.float32)
        qb = jnp.asarray(0.1 * rng.randn(Din), jnp.float32)
        d = FA._ln_dummy()
        site = FA.SiteCfg(q_ln_eps=1e-6, residual=True)
        mesh = self._mesh(4, 2)

        def loss_mesh(xq, wq, s_q):
            a = [wq] + args[1:]
            with FA.fused_mesh(mesh):
                return jnp.sum(
                    FA.fused_dense_attention(
                        xq, x_kv, mask, *a, H, interpret=True,
                        q_ln=(s_q, qb, 1e-6), residual=True,
                    ) ** 2
                )

        def loss_ref(xq, wq, s_q):
            a = [wq] + args[1:]
            return jnp.sum(
                FA._unfused_site(
                    xq, x_kv, mask, *a, s_q, qb, d, d, d, d,
                    num_heads=H, site=site,
                ) ** 2
            )

        gm = jax.grad(loss_mesh, argnums=(0, 1, 2))(x_q, args[0], qs)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_q, args[0], qs)
        for a, b in zip(gm, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
            )
