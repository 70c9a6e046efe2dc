"""Question-word and answer vocabularies [SURVEY §2.2].

The reference builds a word-id vocab for the LSTM path and an answer→id map
(small closed set for VQA-RAD, top-K for PathVQA's open-ended space)
[B:5, B:7, B:9]. Both are deterministic (sorted tie-break) and serialize to
JSON next to checkpoints — answer-id stability is a parity requirement
[SURVEY §2.2 "serialized with checkpoint"].
"""

from __future__ import annotations

import collections
import json
import re
from pathlib import Path
from typing import Dict, Iterable, List, Sequence

PAD_ID = 0
UNK_ID = 1

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


def tokenize_words(text: str) -> List[str]:
    """Lowercase word/punctuation split — the classic VQA preprocessing."""
    return _WORD_RE.findall(text.lower())


def normalize_answer(ans: str) -> str:
    """Canonical answer form: lowercase, strip articles/extra space/period."""
    a = ans.lower().strip().rstrip(".")
    a = re.sub(r"\b(a|an|the)\b", " ", a)
    a = re.sub(r"\s+", " ", a).strip()
    return a


class WordVocab:
    """word → id map with PAD=0, UNK=1."""

    def __init__(self, words: Sequence[str]):
        self.itos = ["<pad>", "<unk>"] + list(words)
        self.stoi = {w: i for i, w in enumerate(self.itos)}

    @classmethod
    def build(
        cls, texts: Iterable[str], max_size: int = 0, min_count: int = 1
    ) -> "WordVocab":
        counts = collections.Counter()
        for t in texts:
            counts.update(tokenize_words(t))
        items = [(w, c) for w, c in counts.items() if c >= min_count]
        items.sort(key=lambda wc: (-wc[1], wc[0]))  # deterministic
        if max_size:
            items = items[: max_size - 2]
        return cls([w for w, _ in items])

    def __len__(self) -> int:
        return len(self.itos)

    def encode(self, text: str, max_len: int) -> List[int]:
        ids = [self.stoi.get(w, UNK_ID) for w in tokenize_words(text)][:max_len]
        return ids + [PAD_ID] * (max_len - len(ids))

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.itos))

    @classmethod
    def load(cls, path: str | Path) -> "WordVocab":
        itos = json.loads(Path(path).read_text())
        v = cls.__new__(cls)
        v.itos = itos
        v.stoi = {w: i for i, w in enumerate(itos)}
        return v


class AnswerVocab:
    """answer → id. Index 0 is <unk>/out-of-vocab (never a real answer)."""

    def __init__(self, answers: Sequence[str]):
        self.itos = ["<unk>"] + list(answers)
        self.stoi = {a: i for i, a in enumerate(self.itos)}

    @classmethod
    def build(cls, answers: Iterable[str], top_k: int = 0) -> "AnswerVocab":
        counts = collections.Counter(normalize_answer(a) for a in answers)
        counts.pop("", None)
        items = sorted(counts.items(), key=lambda ac: (-ac[1], ac[0]))
        if top_k:
            items = items[: top_k - 1]
        return cls([a for a, _ in items])

    def __len__(self) -> int:
        return len(self.itos)

    def encode(self, answer: str) -> int:
        return self.stoi.get(normalize_answer(answer), 0)

    def decode(self, idx: int) -> str:
        # The model head may be statically larger than the built vocab
        # (answer_vocab_size is a config constant); out-of-range → <unk>.
        return self.itos[idx] if 0 <= idx < len(self.itos) else "<unk>"

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.itos))

    @classmethod
    def load(cls, path: str | Path) -> "AnswerVocab":
        itos = json.loads(Path(path).read_text())
        v = cls.__new__(cls)
        v.itos = itos
        v.stoi = {a: i for i, a in enumerate(itos)}
        return v
