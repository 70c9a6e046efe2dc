"""Command-line interface — train / eval / predict / convert / bench
[SURVEY §2.3 "CLI / config"; replaces the reference's argparse scripts].

    python -m btia_tpu.cli train   --config vqa_rad_lstm --workdir runs/rad \
        --set data.data_dir=/data/vqa_rad --set train.epochs=40
    python -m btia_tpu.cli eval    --workdir runs/rad --split test
    python -m btia_tpu.cli predict --workdir runs/rad \
        --image chest.dcm --question "is the lung normal"
    python -m btia_tpu.cli convert --config vqa_rad_lstm \
        --torch-ckpt ref.pt --workdir runs/converted
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def _parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        k, v = pair.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def cmd_train(args) -> None:
    from btia_tpu.configs import get_config
    from btia_tpu.train.trainer import Trainer

    cfg = get_config(args.config, **_parse_overrides(args.set))
    trainer = Trainer(cfg, args.workdir)
    # SIGTERM (TPU maintenance/preemption) → finish the in-flight step,
    # checkpoint, exit cleanly; resume continues bit-identically.
    trainer.install_preemption_handler()
    if args.resume:
        resumed = trainer.resume_if_available()
        print(f"resume: {'ok' if resumed else 'no checkpoint found'}")
    history = trainer.fit()
    print(json.dumps(history[-1] if history else {}, indent=2))


def cmd_eval(args) -> None:
    from btia_tpu.train.checkpoint import Checkpointer
    from btia_tpu.train.trainer import Trainer

    ckpt = Checkpointer(Path(args.workdir) / "checkpoints")
    cfg = ckpt.load_config()
    trainer = Trainer(cfg, args.workdir)
    trainer.state = trainer.ckpt.restore(trainer.state, best=args.best)
    metrics = trainer.evaluate(args.split)
    print(json.dumps(metrics, indent=2, sort_keys=True))


def cmd_predict(args) -> None:
    from btia_tpu.infer.predict import Predictor

    p = Predictor.from_checkpoint(args.workdir, best=args.best)
    questions = args.question
    from btia_tpu.ops.answers import real_limit, topn_real_np

    logits = p.predict_batch(args.image, questions)
    for q, l_ in zip(questions, logits):
        limit = real_limit(len(p.answer_vocab), l_.shape[-1])
        top = topn_real_np(l_, 3, limit)
        answers = [
            {"answer": p.answer_vocab.decode(int(i)), "logit": float(l_[i])}
            for i in top
        ]
        print(json.dumps({"question": q, "top": answers}))


def cmd_convert(args) -> None:
    import torch

    from btia_tpu.configs import get_config
    from btia_tpu.convert.convert import convert_state_dict
    from btia_tpu.models.model import build_model
    from btia_tpu.parallel.mesh import single_device_mesh
    from btia_tpu.train.checkpoint import Checkpointer
    from btia_tpu.train.steps import create_state

    cfg = get_config(args.config, **_parse_overrides(args.set))
    model = build_model(cfg.model)
    mesh = single_device_mesh()
    state = create_state(model, cfg, mesh, steps_per_epoch=1)
    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    template = {"params": state.params}
    if state.batch_stats:
        template["batch_stats"] = state.batch_stats
    converted = convert_state_dict(sd, template)
    state = state.replace(
        params=converted["params"],
        batch_stats=converted.get("batch_stats", state.batch_stats),
    )
    ckpt = Checkpointer(Path(args.workdir) / "checkpoints")
    ckpt.save_config(cfg)
    ckpt.save(state)
    print(f"converted {args.torch_ckpt} → {args.workdir}")


def cmd_serve(args) -> None:
    """Batch streaming inference over a directory of DICOM/JPEG images
    [B:11]: each image is answered with the given questions."""
    from btia_tpu.infer.predict import Predictor
    from btia_tpu.infer.streaming import StreamingServer

    p = Predictor.from_checkpoint(args.workdir, best=args.best)
    exts = {".dcm", ".dicom", ".jpg", ".jpeg", ".png"}
    images = sorted(
        f for f in Path(args.image_dir).iterdir() if f.suffix.lower() in exts
    )
    if not images:
        raise SystemExit(f"error: no images under {args.image_dir}")
    questions = args.question
    server = StreamingServer(
        p,
        image_batch=args.batch,
        questions_per_image=max(len(questions), 1),
        decode_threads=args.threads,
        topk=args.topk,
        dedup_questions=args.dedup,
        max_wait_ms=args.max_wait_ms,
        adaptive_q=args.adaptive_q,
        q_max=args.q_max,
    )
    # Front-load the jit compile (minutes on a cold cache) BEFORE taking
    # requests, and say so — instead of a silent hang at the first batch.
    print("serve: compiling serving program ...", file=sys.stderr, flush=True)
    warm_s = server.warmup()
    print(f"serve: ready (warmup {warm_s:.1f}s)", file=sys.stderr, flush=True)
    from btia_tpu.ops.answers import argmax_real, real_limit

    limit = real_limit(len(p.answer_vocab), p.cfg.model.answer_vocab_size)
    reqs = ((str(f), questions) for f in images)
    # Results arrive in COMPLETION order with the request index — decode
    # threads reorder requests, so indexing (not zipping) attributes each
    # answer row to the right image, even when bad files are skipped.
    for idx, out, n in server.serve(reqs):
        if args.topk:
            _vals, ids = out  # already excludes <unk> + head padding
            answers = [p.answer_vocab.decode(int(ids[i, 0])) for i in range(n)]
        else:
            answers = [
                p.answer_vocab.decode(int(argmax_real(out[i], limit)))
                for i in range(n)
            ]
        print(json.dumps({"image": images[idx].name, "answers": answers}))
    for idx, exc in server.errors:
        print(
            json.dumps({"image": images[idx].name, "error": str(exc)[:200]}),
            file=sys.stderr,
        )
    lat = server.latency_summary()
    print(
        json.dumps(
            {
                "pairs": server.pairs_processed,
                "pairs_per_sec": round(server.pairs_per_second, 1),
                "latency_ms": {
                    k: round(v, 1) for k, v in lat.items() if k.endswith("_ms")
                },
            }
        ),
        file=sys.stderr,
    )


def cmd_bench(args) -> None:
    import subprocess

    cmd = [sys.executable, str(Path(__file__).parent.parent / "bench.py")]
    if args.config:
        cmd += ["--config", args.config]
    raise SystemExit(subprocess.call(cmd))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="btia_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train a registered config")
    p.add_argument("--config", required=True)
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--set", action="append", metavar="key=value")
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate a checkpoint")
    p.add_argument("--workdir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--best", action="store_true")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("predict", help="predict(image, question) [B:5]")
    p.add_argument("--workdir", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--question", action="append", required=True)
    p.add_argument("--best", action="store_true")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("convert", help="PyTorch ckpt → orbax [B:5]")
    p.add_argument("--config", required=True)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--set", action="append", metavar="key=value")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("serve", help="stream a directory of images [B:11]")
    p.add_argument("--workdir", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--question", action="append", required=True)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--threads", type=int, default=2)
    p.add_argument("--best", action="store_true")
    p.add_argument(
        "--topk", type=int, default=None,
        help="fetch only top-k ranked answers (smaller device->host transfer)",
    )
    p.add_argument(
        "--dedup", action="store_true",
        help="encode unique questions once per device batch (exact)",
    )
    p.add_argument(
        "--max-wait-ms", type=float, default=None,
        help="bound per-request latency: ship a padded partial batch once "
        "the oldest pending request has waited this long",
    )
    p.add_argument(
        "--adaptive-q", action="store_true",
        help="grow the fan-out launch shape per batch (up to --q-max) "
        "when requests carry more questions than the base bucket",
    )
    p.add_argument(
        "--q-max", type=int, default=None,
        help="question cap per request with --adaptive-q (default 2x base)",
    )
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.add_argument("--config", default=None)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    try:
        args.fn(args)
    except (KeyError, FileNotFoundError, ValueError) as e:
        # Clean one-line errors at the CLI surface; tracebacks on demand.
        if os.environ.get("BTIA_DEBUG"):
            raise
        raise SystemExit(f"error: {e}") from e


if __name__ == "__main__":
    main()
