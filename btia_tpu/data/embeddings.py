"""Pretrained word-embedding loading for the LSTM question path
[SURVEY §2.1 "GloVe/learned word embeddings"].

No embedding files exist on this machine (zero egress) — the loader is
gated on a local GloVe-format text file and verified against synthetic
fixtures; vocab words missing from the file keep their random init
(scaled to the pretrained norm so training dynamics stay sane).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from btia_tpu.data.vocab import WordVocab


def parse_glove_file(path: str | Path, dim: int) -> Dict[str, np.ndarray]:
    """GloVe text format: one 'word v1 ... vd' per line."""
    table: Dict[str, np.ndarray] = {}
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            parts = line.rstrip().split(" ")
            if len(parts) != dim + 1:
                continue  # header or truncated line
            vec = np.asarray(parts[1:], dtype=np.float32)
            table[parts[0]] = vec
    return table


def build_embedding_matrix(
    vocab: WordVocab,
    glove: Dict[str, np.ndarray],
    dim: int,
    seed: int = 0,
) -> Tuple[np.ndarray, int]:
    """(len(vocab), dim) matrix; returns (matrix, num_hit). PAD row = 0."""
    rng = np.random.RandomState(seed)
    if glove:
        scale = float(np.mean([np.linalg.norm(v) for v in glove.values()]))
    else:
        scale = 1.0
    out = rng.randn(len(vocab), dim).astype(np.float32)
    out *= scale / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-6)
    out[0] = 0.0  # PAD
    hits = 0
    for word, idx in vocab.stoi.items():
        vec = glove.get(word)
        if vec is not None:
            out[idx] = vec
            hits += 1
    return out, hits


def load_word_embeddings_into_params(
    params,
    vocab: WordVocab,
    glove_path: str | Path,
) -> Tuple[dict, int]:
    """Replace question_encoder/word_embed/embedding with GloVe vectors.

    Returns (new_params, num_vocab_words_found). No-op-with-warning shape
    if the file doesn't exist would hide config errors — we raise instead.
    """
    emb = params["question_encoder"]["word_embed"]["embedding"]
    n, dim = emb.shape
    if n != len(vocab):
        raise ValueError(
            f"embedding table rows {n} != vocab size {len(vocab)}"
        )
    glove = parse_glove_file(glove_path, dim)
    matrix, hits = build_embedding_matrix(vocab, glove, dim)
    new_params = dict(params)
    qe = dict(new_params["question_encoder"])
    we = dict(qe["word_embed"])
    we["embedding"] = matrix.astype(np.asarray(emb).dtype)
    qe["word_embed"] = we
    new_params["question_encoder"] = qe
    return new_params, hits
