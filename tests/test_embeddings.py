"""GloVe-format embedding loader tests (synthetic fixture — no real
embeddings on this machine, SURVEY §7.1)."""

import numpy as np

from btia_tpu.data.embeddings import (
    build_embedding_matrix,
    load_word_embeddings_into_params,
    parse_glove_file,
)
from btia_tpu.data.vocab import WordVocab


def _write_glove(path, words, dim, rng):
    lines = []
    vecs = {}
    for w in words:
        v = rng.randn(dim).astype(np.float32)
        vecs[w] = v
        lines.append(w + " " + " ".join(f"{x:.5f}" for x in v))
    path.write_text("\n".join(lines))
    return vecs


class TestGlove:
    def test_parse_and_build(self, tmp_path, rng):
        vocab = WordVocab.build(["is the lung normal", "what organ"])
        vecs = _write_glove(tmp_path / "g.txt", ["lung", "organ", "extra"], 8, rng)
        glove = parse_glove_file(tmp_path / "g.txt", 8)
        assert set(glove) == {"lung", "organ", "extra"}
        matrix, hits = build_embedding_matrix(vocab, glove, 8)
        assert hits == 2
        np.testing.assert_allclose(
            matrix[vocab.stoi["lung"]], vecs["lung"], atol=1e-4
        )
        assert np.all(matrix[0] == 0)  # PAD row

    def test_skips_malformed_lines(self, tmp_path):
        (tmp_path / "g.txt").write_text("header 400000\nword 1.0 2.0\n")
        glove = parse_glove_file(tmp_path / "g.txt", 2)
        assert list(glove) == ["word"]

    def test_load_into_params(self, tmp_path, rng):
        vocab = WordVocab.build(["is the lung normal"])
        _write_glove(tmp_path / "g.txt", ["lung"], 4, rng)
        params = {
            "question_encoder": {
                "word_embed": {
                    "embedding": np.zeros((len(vocab), 4), np.float32)
                }
            }
        }
        new_params, hits = load_word_embeddings_into_params(
            params, vocab, tmp_path / "g.txt"
        )
        assert hits == 1
        assert not np.all(
            new_params["question_encoder"]["word_embed"]["embedding"] == 0
        )

    def test_size_mismatch_raises(self, tmp_path, rng):
        import pytest

        vocab = WordVocab.build(["a b c"])
        params = {
            "question_encoder": {
                "word_embed": {"embedding": np.zeros((2, 4), np.float32)}
            }
        }
        with pytest.raises(ValueError):
            load_word_embeddings_into_params(params, vocab, tmp_path / "x.txt")
