"""Training-throughput benchmark: examples/sec/chip for a full train step
(fwd + bwd + AdamW update) on synthetic batches. [SURVEY §4.2 'Perf'
tier — training leg; serving has bench.py / streaming_e2e.py.]

    python benchmarks/train_bench.py [--config slake_bert --batch 64]

Prints one JSON line per rep set:
    {"config":..., "batch":..., "step_ms":..., "examples_per_sec":...}

Timing rules for the tunneled TPU (CLAUDE.md): block_until_ready() lies,
so every timed window ends in a real host fetch of the loss; steps are
chained through donated state so the device executes them back-to-back.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="slake_bert")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument(
        "--reps", type=int, default=3,
        help="median-of-N steady-state protocol (BENCH_NOTES slumps)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from btia_tpu.configs import get_config
    from btia_tpu.models.model import build_model
    from btia_tpu.parallel.mesh import MeshConfig, make_mesh
    from btia_tpu.train.steps import create_state, make_train_step

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    mesh = make_mesh(MeshConfig(data=len(jax.devices()), model=1))
    ingest = max(256, cfg.model.image_size)
    L = cfg.model.max_question_len
    B = args.batch

    t0 = time.perf_counter()
    state = create_state(model, cfg, mesh, steps_per_epoch=100)
    init_s = time.perf_counter() - t0
    step_fn = make_train_step(model, cfg, mesh)

    rng = np.random.RandomState(0)
    n_bufs = 2
    batches = [
        {
            "images": jnp.asarray(
                rng.randint(0, 255, (B, ingest, ingest, 3)), jnp.uint8
            ),
            "question_ids": jnp.asarray(
                # Valid under either question encoder's embedding table.
                rng.randint(
                    1,
                    min(
                        cfg.model.question_vocab_size,
                        cfg.model.bert_vocab_size,
                    ),
                    (B, L),
                ),
                jnp.int32,
            ),
            "answer_ids": jnp.asarray(
                rng.randint(1, cfg.model.answer_vocab_size, (B,)), jnp.int32
            ),
        }
        for _ in range(n_bufs)
    ]

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batches[0])
    loss = float(metrics["loss"])  # fetch = real completion barrier
    compile_s = time.perf_counter() - t0
    for i in range(args.warmup):
        state, metrics = step_fn(state, batches[i % n_bufs])
    float(metrics["loss"])

    reps = []
    for _ in range(max(args.reps, 1)):
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step_fn(state, batches[i % n_bufs])
        loss = float(metrics["loss"])  # chained via donated state
        reps.append(args.steps * B / (time.perf_counter() - t0))
    reps.sort()
    ex_s = reps[len(reps) // 2]
    print(
        json.dumps(
            {
                "config": args.config,
                "device": str(jax.devices()[0]),
                "batch": B,
                "steps": args.steps,
                "reps_examples_per_sec": [round(r, 1) for r in reps],
                "examples_per_sec": round(ex_s, 1),
                "step_ms": round(1000 * B / ex_s, 2),
                "final_loss": round(loss, 4),
                "init_s": round(init_s, 1),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
