"""Training-step throughput: single-step vs lax.scan multi-step program
[VERDICT r1 item 8; CLAUDE.md tunnel methodology].

    python benchmarks/train_bench.py [--config vqa_rad_lstm --batch 16 --k 8]

The single-step path returns the whole TrainState (~1300 buffers) and the
tunnel pays a fixed per-buffer dispatch cost; the scanned path keeps the
state device-resident across K optimizer steps and returns one stacked
metrics dict. On a directly-attached TPU the gap shrinks to launch
overhead; both numbers fetch real results (block_until_ready lies here).
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
    ap.add_argument("--config", default="vqa_rad_lstm")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=8, help="steps per scanned call")
    ap.add_argument("--calls", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from btia_tpu.configs import get_config
    from btia_tpu.models.model import build_model
    from btia_tpu.parallel.mesh import MeshConfig, make_mesh
    from btia_tpu.parallel.sharding import shard_batch, shard_chunk
    from btia_tpu.train.steps import (
        create_state,
        make_train_step,
        make_train_step_scan,
    )

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    mesh = make_mesh(MeshConfig(-1, 1))
    B = args.batch
    rng = np.random.RandomState(0)
    S = cfg.model.max_question_len
    ingest = max(256, cfg.model.image_size)
    vocab = (
        cfg.model.question_vocab_size
        if cfg.model.question_encoder == "lstm"
        else cfg.model.bert_vocab_size
    )
    batch = {
        "images": rng.randint(0, 255, (B, ingest, ingest, 3)).astype(np.uint8),
        "question_ids": rng.randint(1, vocab, (B, S)).astype(np.int32),
        "answer_ids": rng.randint(1, cfg.model.answer_vocab_size, (B,)).astype(
            np.int32
        ),
        "valid": np.ones((B,), bool),
    }

    def fetch_loss(m):
        return float(np.asarray(jax.device_get(m["loss"])).ravel()[-1])

    # Single-step path.
    state = create_state(model, cfg, mesh, steps_per_epoch=100)
    step1 = make_train_step(model, cfg, mesh)
    db = shard_batch(batch, mesh)
    s, m = step1(state, db)  # compile (donates `state`)
    fetch_loss(m)
    t0 = time.perf_counter()
    for _ in range(args.calls * 2):
        s, m = step1(s, db)
        fetch_loss(m)
    single_s = (time.perf_counter() - t0) / (args.calls * 2)

    # Scanned path (reuse the live state from above — donation recycled
    # the original buffers).
    stepK = make_train_step_scan(model, cfg, mesh)
    chunk = {k: np.stack([v] * args.k) for k, v in batch.items()}
    dc = shard_chunk(chunk, mesh)
    s, ms = stepK(s, dc)  # compile
    fetch_loss(ms)
    t0 = time.perf_counter()
    for _ in range(args.calls):
        s, ms = stepK(s, dc)
        fetch_loss(ms)
    scan_s = (time.perf_counter() - t0) / (args.calls * args.k)

    print(
        json.dumps(
            {
                "config": args.config,
                "batch": B,
                "k": args.k,
                "single_step_s": round(single_s, 4),
                "scanned_per_step_s": round(scan_s, 4),
                "speedup": round(single_s / max(scan_s, 1e-9), 1),
                "examples_per_sec_scanned": round(B / max(scan_s, 1e-9), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
