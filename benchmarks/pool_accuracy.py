"""Quantify the accuracy cost of `image_pool_grid` (VERDICT r1 item 3).

The streaming_vitl config pools ViT-L's 577 image tokens to a 7x7 grid
(+CLS = 50) before BTIA fusion — the main fan-out throughput lever
[B:11]. This ablation measures what that pooling costs in accuracy,
using a CPU-trainable proxy (vit_test: 145 tokens → pool grid 4 → 17,
an 8.5x reduction, close to streaming_vitl's 11.5x) trained to
convergence on the synthetic corpus over several seeds.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python benchmarks/pool_accuracy.py [--seeds 3 --epochs 6]

Results land in BENCH_NOTES.md; configs/config.py cites them.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--num-images", type=int, default=24)
    ap.add_argument("--pool-grid", type=int, default=4)
    args = ap.parse_args()

    from btia_tpu.configs import get_config
    from btia_tpu.configs.config import Config, DataConfig, ModelConfig
    from btia_tpu.data.synthetic import generate_synthetic_dataset
    from btia_tpu.train.trainer import Trainer

    root = Path(tempfile.mkdtemp(prefix="poolstudy_"))
    generate_synthetic_dataset(root / "data", num_images=args.num_images)

    base = get_config("tiny_test")
    results: dict = {}
    for pool in (0, args.pool_grid):
        accs, closed = [], []
        for seed in range(args.seeds):
            model = replace(
                base.model,
                image_encoder="vit_test",
                image_pool_grid=pool,
            )
            train = replace(base.train, epochs=args.epochs, seed=seed)
            cfg = Config(
                name=f"pool{pool}_s{seed}",
                model=model,
                data=DataConfig(dataset="vqa_rad", data_dir=str(root / "data")),
                train=train,
                mesh=base.mesh,
            )
            tr = Trainer(cfg, workdir=root / f"run_p{pool}_s{seed}")
            history = tr.fit()
            best = max(h.get("val_accuracy", 0.0) for h in history)
            best_closed = max(h.get("val_closed_accuracy", 0.0) for h in history)
            accs.append(best)
            closed.append(best_closed)
            print(
                f"pool={pool} seed={seed}: val_acc={best:.3f} "
                f"closed={best_closed:.3f}",
                flush=True,
            )
        results[pool] = {
            "val_accuracy_mean": sum(accs) / len(accs),
            "val_accuracy_per_seed": accs,
            "val_closed_mean": sum(closed) / len(closed),
        }

    delta = (
        results[args.pool_grid]["val_accuracy_mean"]
        - results[0]["val_accuracy_mean"]
    )
    print(
        json.dumps(
            {
                "no_pool": results[0],
                f"pool_{args.pool_grid}": results[args.pool_grid],
                "accuracy_delta": round(delta, 4),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
