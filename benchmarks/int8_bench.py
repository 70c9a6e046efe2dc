"""Fused-epilogue int8 matmul vs XLA bf16 at the serving fan-out FFN
shapes [VERDICT r1 item 1; BENCH_NOTES "Int8 serving"].

    python benchmarks/int8_bench.py [--steps 10 --depth 8]

Methodology (tunnel-aware, see CLAUDE.md): each jit call chains DEPTH
independent matmuls via fori_loop so the ~40 ms launch overhead amortizes;
inputs are generated on device (no tunnel upload); outputs reduce to (N,)
inside the program (no DCE, tiny fetch); timings fetch results.
Prints one JSON line per (shape, impl).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# (name, M, K, N, gelu) — serving fan-out matmuls at B=16, Q=128:
#   BERT FFN:  M = B*Q*S = 2048*32;  BTIA img FFN: M = 2048*50.
SHAPES = [
    ("bert_fc1", 65536, 768, 3072, True),
    ("bert_fc2", 65536, 3072, 768, False),
    ("btia_img_fc1", 102400, 768, 3072, True),
    ("qkv_proj", 65536, 768, 768, False),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from btia_tpu.ops.quant import int8_matmul_fused, quantize_weight

    gelu = functools.partial(jax.nn.gelu, approximate=True)
    key = jax.random.PRNGKey(0)
    D = args.depth

    for name, M, K, N, use_gelu in SHAPES:
        k1, k2, k3, key = jax.random.split(key, 4)
        NBUF = 4  # distinct HBM buffers, reused round-robin through the chain
        make_xs = jax.jit(
            lambda k: (jax.random.normal(k, (NBUF, M, K), jnp.bfloat16) * 0.5)
        )
        xs = make_xs(k1)
        w = jax.random.normal(k2, (K, N), jnp.float32) * 0.02
        b = jax.random.normal(k3, (N,), jnp.float32) * 0.1
        w_i8, ws = jax.jit(quantize_weight)(w)
        w_bf = w.astype(jnp.bfloat16)
        act = gelu if use_gelu else None

        def bf16_one(x, w, b):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            if act is not None:
                y = act(y)
            return y.astype(jnp.bfloat16).astype(jnp.float32).sum(axis=0)

        def int8_one(x, w_i8, ws, b):
            y = int8_matmul_fused(x, w_i8, ws, b, act=act)
            return y.astype(jnp.float32).sum(axis=0)

        def chained(one):
            def run(xs, *rest):
                def body(i, acc):
                    return acc + one(xs[i % NBUF], *rest)

                return jax.lax.fori_loop(0, D, body, jnp.zeros((N,), jnp.float32))

            return jax.jit(run)

        impls = {
            "bf16_xla": (chained(bf16_one), (xs, w_bf, b)),
            "int8_pallas": (chained(int8_one), (xs, w_i8, ws, b)),
        }
        flops = 2 * M * K * N
        for impl, (fn, fargs) in impls.items():
            try:
                np.asarray(fn(*fargs))  # compile
                np.asarray(fn(*fargs))  # warm
                t0 = time.perf_counter()
                outs = [fn(*fargs) for _ in range(args.steps)]
                for o in outs:
                    np.asarray(o)
                dt = (time.perf_counter() - t0) / (args.steps * D)
                print(
                    json.dumps(
                        {
                            "shape": name,
                            "impl": impl,
                            "ms_per_matmul": round(dt * 1e3, 3),
                            "tflops": round(flops / dt / 1e12, 1),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:
                print(
                    json.dumps({"shape": name, "impl": impl, "error": str(e)[:200]}),
                    flush=True,
                )


if __name__ == "__main__":
    main()
