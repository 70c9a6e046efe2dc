"""Offline WordPiece tokenizer for the BERT question path [B:5, B:8].

HF tokenizers need a downloaded vocab file; with zero network on this
machine [SURVEY §7.1] we implement greedy-longest-match WordPiece directly.
Given a real ``bert-base-uncased`` vocab.txt it reproduces HF's
BertTokenizer output (basic-tokenize → lowercase → WordPiece, [CLS]/[SEP]
framing); absent one, `toy_vocab` builds a corpus-specific WordPiece vocab
so the BERT path stays trainable end-to-end.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Optional, Sequence

from btia_tpu.data.vocab import tokenize_words

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIALS = [PAD, UNK, CLS, SEP, MASK]


class WordPieceTokenizer:
    def __init__(self, vocab: Sequence[str]):
        self.itos = list(vocab)
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        for tok in (PAD, UNK, CLS, SEP):
            if tok not in self.stoi:
                raise ValueError(f"vocab missing special token {tok}")
        self.pad_id = self.stoi[PAD]
        self.unk_id = self.stoi[UNK]
        self.cls_id = self.stoi[CLS]
        self.sep_id = self.stoi[SEP]

    @property
    def vocab_size(self) -> int:
        return len(self.itos)

    @classmethod
    def from_vocab_file(cls, path: str | Path) -> "WordPieceTokenizer":
        lines = Path(path).read_text(encoding="utf-8").splitlines()
        return cls([ln.rstrip("\n") for ln in lines if ln.strip() or ln == ""])

    @classmethod
    def toy_vocab(
        cls, texts: Iterable[str], max_size: int = 2000
    ) -> "WordPieceTokenizer":
        """Whole words + all single chars (+ ## variants) from a corpus."""
        words: dict[str, int] = {}
        chars: set[str] = set()
        for t in texts:
            for w in tokenize_words(t):
                words[w] = words.get(w, 0) + 1
                chars.update(w)
        vocab = list(SPECIALS)
        vocab += sorted(chars) + ["##" + c for c in sorted(chars)]
        ranked = sorted(words.items(), key=lambda wc: (-wc[1], wc[0]))
        for w, _ in ranked:
            if len(vocab) >= max_size:
                break
            if w not in vocab:
                vocab.append(w)
        return cls(vocab)

    def _wordpiece(self, word: str) -> List[int]:
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.stoi:
                    cur = self.stoi[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str, max_len: int) -> List[int]:
        """[CLS] pieces [SEP], padded to max_len with [PAD]=0."""
        ids = [self.cls_id]
        for w in tokenize_words(text):
            ids.extend(self._wordpiece(w))
            if len(ids) >= max_len - 1:
                break
        ids = ids[: max_len - 1] + [self.sep_id]
        return ids + [self.pad_id] * (max_len - len(ids))

    def save(self, path: str | Path) -> None:
        Path(path).write_text("\n".join(self.itos), encoding="utf-8")
