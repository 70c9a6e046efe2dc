"""Attention kernel microbenchmark: Pallas vs XLA across the framework's
real shapes [SURVEY §4.2 'Perf' tier]. Informs the small-score-tile
heuristic in ops/attention.py.

    python benchmarks/attention_bench.py [--steps 10]

Prints one JSON line per (site, impl).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# (site, B, H, Sq, Sk, Dh) — the attention shapes the models actually run.
SHAPES = [
    ("vit_l336_self", 8, 16, 577, 577, 64),
    ("vit_b16_self", 16, 12, 197, 197, 64),
    ("bert_self_fanout", 512, 12, 32, 32, 64),
    ("btia_img2txt_pooled", 512, 12, 50, 32, 64),
    ("ad_head_factorized", 512, 12, 256, 82, 64),
]


def fanout_sweep(steps: int) -> None:
    """Sweep the fan-out kernel's scheduling knob (_FANOUT_PACK, the bb
    row-packing target) at the serving-real fan-out shapes
    (B = B_img·Q = 2048)."""
    import jax
    import jax.numpy as jnp

    from btia_tpu.ops import attention as A

    # (site, B, Sq, Sk, H, D) in the projection-native (B, S, H*D) layout.
    shapes = [
        ("bert_fanout", 2048, 32, 32, 12, 64),
        ("btia_txt2img", 2048, 32, 50, 12, 64),
        ("btia_img2txt", 2048, 50, 32, 12, 64),
        ("ad_head", 2048, 64, 82, 12, 64),
    ]
    rng = np.random.RandomState(0)
    K = 20
    for site, B, Sq, Sk, H, D in shapes:
        q = jnp.asarray(rng.randn(B, Sq, H * D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, Sk, H * D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, Sk, H * D), jnp.bfloat16)
        cm = jnp.ones((B, Sk), jnp.float32)
        # g>1 measured uniformly non-winning (and g=8 fails remote compile
        # at some shapes), and the phase-separated schedule measured
        # equal-or-worse at every site (BENCH_NOTES r3) — both fixed now.
        # The remaining scheduling knob is the bb row-packing target.
        for pack in (256, 512):
            A._FANOUT_G = 1
            A._FANOUT_PACK = pack

            def f_body(q, k, v):
                def body(i, acc):
                    qi = q + (i * 1e-6).astype(q.dtype)
                    out = A._fanout_mha(qi, k, v, cm, H, False)
                    return acc + out.sum().astype(jnp.float32)

                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            try:
                f = jax.jit(f_body)
                float(f(q, k, v))
                t0 = time.perf_counter()
                for _ in range(steps):
                    float(f(q, k, v))
                dt = (time.perf_counter() - t0) / steps / K
                print(
                    json.dumps(
                        {
                            "site": site,
                            "pack": pack,
                            "ms": round(dt * 1000, 3),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    json.dumps(
                        {"site": site, "pack": pack, "error": str(e)[:120]}
                    ),
                    flush=True,
                )
    A._FANOUT_PACK = 256


def fused_sweep(steps: int) -> None:
    """A/B the fused projection+attention+projection kernels vs the
    unfused XLA chain at the serving-real sites (ops/fused_attn.py)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    from btia_tpu.ops import fused_attn as FA

    rng = np.random.RandomState(0)
    H, D, Din = 12, 64, 768
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.05, jnp.float32)
    params = [mk(Din, H * D), mk(H * D), mk(Din, H * D), mk(H * D),
              mk(Din, H * D), mk(H * D), mk(H * D, Din), mk(Din)]
    K = 20

    def timeit(fn, x):
        def body(xx):
            def it(i, acc):
                xi = xx + (i * 1e-6).astype(xx.dtype)
                return acc + fn(xi).sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, K, it, jnp.float32(0))

        g = jax.jit(body)
        float(g(x))
        t0 = time.perf_counter()
        for _ in range(steps):
            float(g(x))
        return (time.perf_counter() - t0) / steps / K * 1000

    # (site, Sq, Sk) — q and kv streams both (2048, S, 768) bf16.
    for site, Sq, Sk in (("bert_self", 32, 32), ("btia_img_from_txt", 50, 32),
                         ("btia_txt_from_img", 32, 50)):
        xq = jnp.asarray(rng.randn(2048, Sq, Din), jnp.bfloat16)
        xkv = (
            xq if Sq == Sk
            else jnp.asarray(rng.randn(2048, Sk, Din), jnp.bfloat16)
        )
        mask = jnp.ones((2048, Sk), bool)
        for name, fn in (
            ("fused", lambda a: FA._fused(a, xkv, mask, *params, H, False)),
            ("unfused", lambda a: FA._unfused(a, xkv, mask, *params, num_heads=H)),
        ):
            try:
                ms = timeit(fn, xq)
                print(json.dumps({"site": site, "impl": name,
                                  "ms": round(ms, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"site": site, "impl": name,
                                  "error": str(e)[:120]}), flush=True)
    # AD head: batch-invariant queries.
    qs = mk(64, Din)
    xkv = jnp.asarray(rng.randn(2048, 82, Din), jnp.bfloat16)
    mask = jnp.ones((2048, 82), bool)
    for name, fn in (
        ("fused", lambda t: FA._staticq(qs, t, mask, *params, H, False)),
        ("unfused", lambda t: FA._staticq_unfused(qs, t, mask, *params, num_heads=H)),
    ):
        try:
            ms = timeit(fn, xkv)
            print(json.dumps({"site": "ad_head_staticq", "impl": name,
                              "ms": round(ms, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"site": "ad_head_staticq", "impl": name,
                              "error": str(e)[:120]}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--sites", default="")
    ap.add_argument("--fanout-sweep", action="store_true")
    ap.add_argument("--fused-sweep", action="store_true")
    ap.add_argument(
        "--dim-semantics", default=None, choices=["arbitrary", "parallel"],
        help="override ops.fused_attn._DIM_SEMANTICS for this run "
        "(VERDICT r3 #7 A/B)",
    )
    ap.add_argument(
        "--staticq-bb", type=int, default=None,
        help="override ops.fused_attn._STATICQ_BB (batch packing) "
        "for this run (VERDICT r3 #7 A/B)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    import jax.numpy as jnp

    from btia_tpu.ops import attention as A
    from btia_tpu.ops.attention import mha, mha_bshd

    if args.dim_semantics or args.staticq_bb:
        from btia_tpu.ops import fused_attn as FA

        if args.dim_semantics:
            FA._DIM_SEMANTICS = args.dim_semantics
        if args.staticq_bb:
            FA._STATICQ_BB = args.staticq_bb
        print(json.dumps({"knobs": {"dim_semantics": FA._DIM_SEMANTICS,
                                    "staticq_bb": FA._STATICQ_BB}}),
              flush=True)

    if args.fanout_sweep:
        fanout_sweep(args.steps)
        return
    if args.fused_sweep:
        fused_sweep(args.steps)
        return

    rng = np.random.RandomState(0)
    for site, B, H, Sq, Sk, D in SHAPES:
        if args.sites and site not in args.sites:
            continue
        q = jnp.asarray(rng.randn(B, H, Sq, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, Sk, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, Sk, D), jnp.bfloat16)
        flops = 4 * B * H * Sq * Sk * D
        K = 20  # inner repeats amortize the ~35 ms per-launch tunnel overhead

        impls = ["pallas", "xla"]
        if Sq * Sk <= 4096:
            impls.append("packed")
        if Sq * Sk > A._SMALL_SCORE_TILE and D % 64 == 0 and (H * D) % 128 == 0:
            # Long-seq layout comparison from the projection-native
            # (B, S, H, D) tensors the models actually hold: transpose +
            # per-(b,h) kernel vs the head-pad-free (B, S, H*D) kernel
            # (VERDICT r2 #4 — the ~17 ms/step layout-copy residual).
            impls += ["bshd_flash", "bshd_transpose"]
        # BSHD copies of the probes, materialized OUTSIDE the timed jit so
        # the bshd_* impls measure exactly what the model pays from its
        # projection-native layout (an in-jit transpose would CSE against
        # the transpose path's internal one and hide its cost).
        qs, ks, vs = (
            jnp.asarray(np.ascontiguousarray(np.asarray(x).transpose(0, 2, 1, 3)))
            for x in (q, k, v)
        )
        for impl in impls:
            try:
                bshd = impl.startswith("bshd_")
                if bshd:
                    A._BSHD_FLASH_LONG_SEQ = impl == "bshd_flash"

                def f_body(q, k, v, impl=impl, bshd=bshd):
                    def body(i, acc):
                        # data-dependent perturbation defeats CSE/hoisting
                        qi = q + (i * 1e-6).astype(q.dtype)
                        out = mha_bshd(qi, k, v) if bshd else mha(qi, k, v, impl=impl)
                        return acc + out.sum().astype(jnp.float32)

                    return jax.lax.fori_loop(0, K, body, jnp.float32(0))

                f = jax.jit(f_body)
                a1, a2, a3 = (qs, ks, vs) if bshd else (q, k, v)
                float(f(a1, a2, a3))  # compile + run
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    s = float(f(a1, a2, a3))
                dt = (time.perf_counter() - t0) / args.steps / K
                print(
                    json.dumps(
                        {
                            "site": site,
                            "impl": impl,
                            "ms": round(dt * 1000, 2),
                            "tflops": round(flops / dt / 1e12, 1),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    json.dumps({"site": site, "impl": impl, "error": str(e)[:120]}),
                    flush=True,
                )


if __name__ == "__main__":
    main()
