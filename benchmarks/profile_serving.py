"""Capture + summarize a device-time profile of the serving step.

    python benchmarks/profile_serving.py [--batch 16 --questions 128]

Runs the streaming_vitl serving program a few steps under
jax.profiler.trace, then parses the xplane proto (via TensorFlow's
bundled profiler proto) and prints per-op-category self-times.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def summarize_xplane(logdir: str, top: int = 25) -> None:
    xplane_pb2 = None
    for modpath in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "xprof.protobuf.xplane_pb2",
    ):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(modpath)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        print("no xplane proto module available")
        return

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane found under", logdir)
        return
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(Path(paths[-1]).read_bytes())
    import re

    totals: dict = collections.Counter()  # per exact op
    counts: dict = collections.Counter()
    cats: dict = collections.Counter()  # per (op kind, output shape)
    catn: dict = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            # Only the synchronous op timeline: 'Async XLA Ops' durations
            # span copy-start→done and overlap compute (double-counts).
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                ms = ev.duration_ps / 1e9
                totals[name] += ms
                counts[name] += 1
                m = re.match(
                    r"%?([a-zA-Z_\-]+)[\w.\-]* = (\w+\[[\d,]*\])", name
                )
                key = f"{m.group(1)} -> {m.group(2)}" if m else name[:60]
                cats[key] += ms
                catn[key] += 1
    total_ms = sum(totals.values())
    print("\n== op kind × output shape (device ms over profiled window) ==")
    for name, ms in cats.most_common(top):
        print(
            f"{ms:9.2f} ms  {100*ms/max(total_ms,1e-9):5.1f}%  "
            f"x{catn[name]:<4d} {name[:90]}"
        )
    print("\n== top individual ops ==")
    for name, ms in totals.most_common(top):
        print(
            f"{ms:9.2f} ms  {100*ms/max(total_ms,1e-9):5.1f}%  "
            f"x{counts[name]:<3d} {name[:90]}"
        )
    print(f"{total_ms:9.2f} ms  total device op time")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="streaming_vitl")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--questions", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/btia_profile")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()

    if args.summarize_only:
        summarize_xplane(args.logdir)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from btia_tpu.configs import get_config
    from btia_tpu.models.model import build_model
    from btia_tpu.utils.profiling import trace

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    B, Q = args.batch, args.questions
    L = cfg.model.max_question_len
    ingest = max(256, cfg.model.image_size)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": key, "dropout": key},
        jnp.zeros((2, ingest, ingest, 3), jnp.uint8),
        jnp.zeros((2, L), jnp.int32),
        train=False,
    )

    def serve_step(variables, images, qids):
        img_tokens = model.apply(variables, images, method="encode_image")
        logits = model.apply(variables, img_tokens, qids, method="answer_questions")
        return jax.lax.top_k(logits, 5)

    fwd = jax.jit(serve_step)
    imgs = rng.randint(0, 255, (B, ingest, ingest, 3)).astype(np.uint8)
    qids = rng.randint(1, cfg.model.bert_vocab_size, (B, Q, L)).astype(np.int32)

    def fetch(o):
        np.asarray(o[0]), np.asarray(o[1])

    t0 = time.perf_counter()
    fetch(fwd(variables, imgs, qids))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    fetch(fwd(variables, imgs, qids))

    with trace(args.logdir):
        outs = [fwd(variables, imgs, qids) for _ in range(args.steps)]
        for o in outs:
            fetch(o)
    t1 = time.perf_counter()
    outs = [fwd(variables, imgs, qids) for _ in range(args.steps)]
    for o in outs:
        fetch(o)
    wall = time.perf_counter() - t1
    print(
        json.dumps(
            {
                "step_ms": round(1000 * wall / args.steps, 1),
                "pairs_per_sec": round(args.steps * B * Q / wall, 1),
            }
        ),
        flush=True,
    )
    summarize_xplane(args.logdir)


if __name__ == "__main__":
    main()
