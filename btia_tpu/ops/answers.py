"""The single source of the "real answer" rule for logit selection.

The answer head is statically sized to `ModelConfig.answer_vocab_size`;
only the first `len(answer_vocab)` slots denote real answers, and slot 0
is `<unk>`/out-of-vocab, never a real answer (data/vocab.py AnswerVocab).
Every surface that turns logits into answers — eval argmax
(train/steps.py), predict_answer, `cli predict`/`cli serve`, streaming
top-k, sharded-serving top-k — must exclude both; encoding the rule once
keeps those surfaces consistent (a miss on one silently skews it relative
to eval — round-2 review finding).

All helpers take `limit = min(len(answer_vocab), head_size)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def real_limit(answer_vocab_len: int, head_size: int) -> int:
    return min(answer_vocab_len, head_size)


def argmax_real(logits, limit: int):
    """Best real-answer id. Works on numpy and jax arrays (host decode and
    jit'd eval share the same expression)."""
    return logits[..., 1:limit].argmax(-1) + 1


def topk_real(logits: jax.Array, k: int, limit: int):
    """(values, ids) of the k best real answers — jit/TPU path.

    k is clamped to the number of REAL answers (limit-1; ids 1..limit-1):
    beyond that lax.top_k would either crash (k > head size) or return
    masked slots that decode to '<unk>' rows presented as ranked answers.
    """
    k = max(1, min(k, limit - 1, logits.shape[-1]))
    idx = jnp.arange(logits.shape[-1])
    masked = jnp.where((idx == 0) | (idx >= limit), -1e30, logits)
    return jax.lax.top_k(masked, k)


def topn_real_np(logits: np.ndarray, n: int, limit: int) -> np.ndarray:
    """Ids of the n best real answers, host-side (ranked, descending)."""
    return 1 + np.argsort(-logits[..., 1:limit], axis=-1)[..., :n]
