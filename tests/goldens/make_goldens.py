"""Regenerate the checked-in golden logits [SURVEY §4.2 'Parity' tier].

Weights are filled DETERMINISTICALLY (index-hash pattern, no RNG) so the
golden is reproducible across machines, library versions, and frameworks;
both the Flax model and the PyTorch re-statement load the same pattern.

    python tests/goldens/make_goldens.py   # rewrites golden_tiny.npz
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

GOLDEN = Path(__file__).parent / "golden_tiny.npz"


def pattern_fill(shape) -> np.ndarray:
    """Deterministic pseudo-random values in [-0.05, 0.05] from indices."""
    n = int(np.prod(shape)) if shape else 1
    idx = np.arange(n, dtype=np.float64)
    vals = np.sin(idx * 12.9898 + 78.233) * 43758.5453
    vals = (vals - np.floor(vals)) * 0.1 - 0.05
    return vals.reshape(shape).astype(np.float32)


def fill_tree(tree):
    import jax

    return jax.tree.map(lambda x: pattern_fill(np.shape(x)), tree)


def probes():
    h = np.arange(64, dtype=np.float64)
    img = np.sin(h[None, :, None] * 0.37 + h[None, None, :] * 0.73)
    img = ((img * 0.5 + 0.5) * 255).astype(np.uint8)
    images = np.repeat(img[:, :, :, None], 3, axis=3)  # (1, 64, 64, 3)
    qids = np.array([[5, 17, 3, 42, 9, 0, 0, 0, 0, 0]], dtype=np.int32)
    return images, qids


def build():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from btia_tpu.configs.config import ModelConfig
    from btia_tpu.models.model import build_model

    cfg = ModelConfig(
        image_encoder="resnet_tiny",
        question_encoder="lstm",
        hidden_dim=64,
        num_heads=4,
        btia_layers=1,
        head="mlp",
        answer_vocab_size=16,
        question_vocab_size=64,
        word_embed_dim=24,
        lstm_hidden=32,
        max_question_len=10,
        mixed_precision=False,
    )
    model = build_model(cfg)
    images, qids = probes()
    key = jax.random.PRNGKey(0)
    template = model.init({"params": key, "dropout": key}, images, qids)
    variables = {
        "params": fill_tree(template["params"]),
        "batch_stats": jax.tree.map(
            lambda x: np.zeros(np.shape(x), np.float32)
            if "var" not in str(x)
            else x,
            template["batch_stats"],
        ),
    }
    # batch_stats: mean=0, var=1 deterministically
    def stats_fill(path, x):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return (
            np.ones(np.shape(x), np.float32)
            if leaf == "var"
            else np.zeros(np.shape(x), np.float32)
        )

    import jax.tree_util as jtu

    variables["batch_stats"] = jtu.tree_map_with_path(
        stats_fill, template["batch_stats"]
    )
    logits = np.asarray(model.apply(variables, images, qids, train=False))
    return cfg, variables, images, qids, logits


if __name__ == "__main__":
    cfg, variables, images, qids, logits = build()
    np.savez(GOLDEN, images=images, qids=qids, logits=logits)
    print(f"wrote {GOLDEN}: logits {logits.shape}, mean {logits.mean():.6f}")
