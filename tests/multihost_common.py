"""Shared fixtures for the multi-host test: the deterministic global
batch every process regenerates identically, and a replicated-scalar
parameter checksum that is fetchable from any process."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_global_batch(cfg) -> dict:
    """Deterministic 8-row global batch for the tiny config."""
    rng = np.random.RandomState(0)
    B = 8
    ingest = max(256, cfg.model.image_size)
    return {
        "images": rng.randint(0, 255, (B, ingest, ingest, 3)).astype(np.uint8),
        "question_ids": rng.randint(
            1, cfg.model.question_vocab_size, (B, cfg.model.max_question_len)
        ).astype(np.int32),
        "answer_ids": rng.randint(
            0, cfg.model.answer_vocab_size, (B,)
        ).astype(np.int32),
    }


def param_checksum(params) -> float:
    """sum(|p|) over the whole tree, computed ON DEVICE (params may be
    model-sharded) and returned as a replicated scalar."""

    def total(p):
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
            p,
            jnp.float32(0.0),
        )

    return float(np.asarray(jax.jit(total)(params)))
