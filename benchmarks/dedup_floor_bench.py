"""A/B the fused-kernel engagement floor at the DEDUP serving shape
[VERDICT r4 #4].

The dedup path (`answer_questions_indexed`) encodes only the U unique
questions per device batch; with the default template pool (64) at DP>1,
or any U < 64 batch, the per-shard question-tower batch sits BELOW
`_FANOUT_MIN_BATCH = 64` and the BERT tower runs the unfused XLA road.
That floor was tuned on the ALL-DISTINCT path (B·Q = 2048 rows), never
A/B'd at the dedup tower's actual U. This bench times the full dedup
serve step (ViT encode once per image + indexed fan-out) at
U ∈ {16, 32, 64} under a given floor:

    BTIA_FANOUT_MIN_BATCH=16 python benchmarks/dedup_floor_bench.py
    BTIA_FANOUT_MIN_BATCH=64 python benchmarks/dedup_floor_bench.py   # default

(the knob is read at import, so fused-vs-unfused needs two processes;
fused engages at the towers where batch ≥ floor). Prints one JSON line
per U. Timing protocol = bench.py: dispatch all steps, then fetch
(block_until_ready lies on the tunneled TPU — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="streaming_vitl")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--questions", type=int, default=128)
    ap.add_argument("--u-values", default="16,32,64")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from btia_tpu.configs import get_config
    from btia_tpu.models.model import build_model

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    B, Q = args.batch, args.questions
    L = cfg.model.max_question_len
    ingest = max(256, cfg.model.image_size)
    floor = os.environ.get("BTIA_FANOUT_MIN_BATCH", "64")

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": key, "dropout": key},
        jnp.zeros((2, ingest, ingest, 3), jnp.uint8),
        jnp.zeros((2, L), jnp.int32),
        train=False,
    )

    def serve_step(variables, images, unique_ids, qmap):
        img_tokens = model.apply(variables, images, method="encode_image")
        logits = model.apply(
            variables,
            img_tokens,
            unique_ids,
            qmap,
            method="answer_questions_indexed",
        )
        return jax.lax.top_k(logits, args.topk)

    fwd = jax.jit(serve_step)

    n_bufs = 4
    image_bufs = [
        rng.randint(0, 255, (B, ingest, ingest, 3)).astype(np.uint8)
        for _ in range(n_bufs)
    ]

    for U in (int(u) for u in args.u_values.split(",")):
        uid_bufs = [
            rng.randint(1, cfg.model.bert_vocab_size, (U, L)).astype(np.int32)
            for _ in range(n_bufs)
        ]
        qmap_bufs = [
            rng.randint(0, U, (B, Q)).astype(np.int32) for _ in range(n_bufs)
        ]

        def run(i):
            j = i % n_bufs
            return fwd(variables, image_bufs[j], uid_bufs[j], qmap_bufs[j])

        def fetch(out):
            vals, idxs = out
            return np.asarray(vals), np.asarray(idxs)

        t0 = time.perf_counter()
        fetch(run(0))
        compile_s = time.perf_counter() - t0
        fetch(run(1))  # warmup

        pairs = args.steps * B * Q
        reps = []
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            outs = [run(i) for i in range(args.steps)]
            for o in outs:
                fetch(o)
            reps.append(pairs / (time.perf_counter() - t0))
        reps.sort()
        med = reps[len(reps) // 2]
        print(
            json.dumps(
                {
                    "floor": floor,
                    "U": U,
                    "pairs_per_sec": round(med, 1),
                    "reps": [round(r, 1) for r in reps],
                    "step_ms": round(1000 * pairs / med / args.steps, 2),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
