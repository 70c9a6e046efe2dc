"""Headline benchmark: image–question pairs/sec/chip, streaming inference
[B:2, B:5, B:11]. Prints ONE JSON line.

Measures the device serving pipeline of the streaming config [B:11] —
on-device resize/normalize → ViT-L/336 encode (ONCE per image) → BTIA
fusion → AD answer head fanned out over Q questions per image — on
randomly initialized weights (no pretrained checkpoints exist on this
machine, SURVEY §7.1; throughput is weight-independent).

Baseline: the reference publishes no numbers (BASELINE.json:13
"published": {}); the build target is ≥5,000 pairs/sec/chip [B:5], so
vs_baseline = measured / 5000.

Flags: --config NAME --images N --questions Q --batch B --steps N --json-only
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TARGET_PAIRS_PER_SEC = 5000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="streaming_vitl")
    ap.add_argument("--batch", type=int, default=16, help="images per step")
    ap.add_argument("--questions", type=int, default=128, help="questions/image")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument(
        "--reps", type=int, default=3,
        help="warm repetitions of the timed window; the MEDIAN is the "
        "headline (steady-state protocol, VERDICT r2 #7: transient tunnel "
        "slumps must not masquerade as regressions)",
    )
    ap.add_argument("--topk", type=int, default=5, help="answers fetched/question")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    # The axon tunnel can wedge (backend init hangs in a retry loop —
    # observed >2 h) but RECOVERS ON ITS OWN (CLAUDE.md: "poll, don't
    # thrash"). Round 3 probed once for 300 s and gave up — one transient
    # wedge zeroed the round's headline (VERDICT r3 weak #1). Now: poll
    # with bounded retries (~25 min total) via SUBPROCESS probes — each
    # subprocess is a fresh backend-init attempt, whereas an in-process
    # retry would join the same stuck init.
    import os
    import subprocess
    import threading

    def _probe_subprocess(timeout_s: float) -> bool:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=timeout_s,
                capture_output=True,
            )
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    deadline = time.monotonic() + 25 * 60
    healthy = False
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        if _probe_subprocess(90):
            healthy = True
            break
        print(
            f"bench: TPU backend probe {attempt} failed (tunnel wedged?); "
            f"retrying in 45s", file=sys.stderr, flush=True,
        )
        time.sleep(45)
    if not healthy:
        print(
            json.dumps(
                {
                    "metric": "image_question_pairs_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "pairs/s/chip",
                    "vs_baseline": 0.0,
                    "error": "backend init never completed across "
                    f"{attempt} probes over 25min (TPU tunnel wedged)",
                }
            ),
            flush=True,
        )
        os._exit(3)

    # Probe passed: init in-process too, with a deadline backstop in case
    # the tunnel wedges between probe and init.
    probe_ok: list = []

    def _probe():
        import jax as _jax

        probe_ok.append(len(_jax.devices()))

    _t = threading.Thread(target=_probe, daemon=True)
    _t.start()
    _t.join(300)
    if not probe_ok:
        print(
            json.dumps(
                {
                    "metric": "image_question_pairs_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "pairs/s/chip",
                    "vs_baseline": 0.0,
                    "error": "backend init hung after a healthy probe "
                    "(TPU tunnel wedged mid-startup)",
                }
            ),
            flush=True,
        )
        os._exit(3)

    import jax

    # Persistent compilation cache: the ViT-L serving program takes ~7 min
    # to compile via the remote-compile helper; cache it across runs.
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/btia_jax_cache"
        )
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

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    init_imgs = jnp.zeros((2, ingest, ingest, 3), jnp.uint8)
    init_qids = jnp.zeros((2, L), jnp.int32)
    t0 = time.perf_counter()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": key, "dropout": key}, init_imgs, init_qids, train=False
    )
    init_s = time.perf_counter() - t0

    def serve_step(variables, images, qids):
        img_tokens = model.apply(variables, images, method="encode_image")
        logits = model.apply(
            variables, img_tokens, qids, method="answer_questions"
        )
        # Realistic serving fetches top-k answers, not 2048 fp32 logits —
        # the answer-id contract survives; host download shrinks 400x.
        return jax.lax.top_k(logits, args.topk)

    fwd = jax.jit(serve_step)

    # Host-staged uint8 inputs (decode is host-side by design [B:5]); a few
    # distinct buffers so we are not measuring a cached-transfer fiction.
    n_bufs = 4
    image_bufs = [
        rng.randint(0, 255, (B, ingest, ingest, 3)).astype(np.uint8)
        for _ in range(n_bufs)
    ]
    qid_bufs = [
        rng.randint(1, cfg.model.bert_vocab_size, (B, Q, L)).astype(np.int32)
        for _ in range(n_bufs)
    ]

    # NOTE on timing: on the axon-tunneled TPU, block_until_ready() returns
    # before remote execution finishes; only a real host fetch
    # (np.asarray) observes completion. We therefore measure the PIPELINED
    # serving loop: dispatch all steps (device executes in order), then
    # fetch every output — wall time covers real compute + transfers.
    def run(i):
        return fwd(variables, image_bufs[i % n_bufs], qid_bufs[i % n_bufs])

    def fetch(out):
        vals, idxs = out
        return np.asarray(vals), np.asarray(idxs)

    t0 = time.perf_counter()
    fetch(run(0))
    compile_s = time.perf_counter() - t0

    for i in range(args.warmup):
        fetch(run(i))

    pairs = args.steps * B * Q
    reps = []
    for _ in range(max(args.reps, 1)):
        t0 = time.perf_counter()
        outs = [run(i) for i in range(args.steps)]
        for o in outs:
            fetch(o)
        reps.append(pairs / (time.perf_counter() - t0))
    reps.sort()
    pairs_per_sec = reps[len(reps) // 2]  # median rep
    result = {
        "metric": "image_question_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / TARGET_PAIRS_PER_SEC, 3),
    }
    if not args.json_only:
        detail = {
            "config": args.config,
            "device": str(jax.devices()[0]),
            "images_per_step": B,
            "questions_per_image": Q,
            "steps": args.steps,
            "reps_pairs_per_sec": [round(r, 1) for r in reps],
            "step_ms": round(1000 * pairs / pairs_per_sec / args.steps, 2),
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
