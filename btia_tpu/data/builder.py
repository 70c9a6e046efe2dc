"""Config → datasets + vocabs + iterators (the L1 glue) [SURVEY §1.1 L1].

Builds the per-config data module: loads splits, constructs the question
text encoder matching the question encoder type (word-id vocab for LSTM,
WordPiece for BERT [B:5]) and the answer vocabulary (top-K capped at the
model's head size [B:7, B:9]), and hands out epoch iterators.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, List, Optional

from btia_tpu.configs.config import Config
from btia_tpu.data.datasets import VQASample, load_dataset
from btia_tpu.data.pipeline import Batch, ImageCache, make_iterator, steps_per_epoch
from btia_tpu.data.vocab import AnswerVocab, WordVocab
from btia_tpu.data.wordpiece import WordPieceTokenizer


@dataclasses.dataclass
class DataModule:
    cfg: Config
    train: List[VQASample]
    val: List[VQASample]
    test: List[VQASample]
    text_encoder: object
    answer_vocab: AnswerVocab
    cache: ImageCache

    @property
    def ingest_size(self) -> int:
        # Host ships uint8 at (slightly above) encoder resolution; the
        # on-device transform does the final resize [B:5]. Configs whose
        # sources are already at encoder resolution override via
        # data.ingest_size (tunnel bandwidth, ~43 MB/s, is the binding
        # host→device constraint — BENCH_NOTES).
        return self.cfg.data.ingest_size or max(256, self.cfg.model.image_size)

    def iterator(
        self, split: str, shuffle: bool = False, seed: int = 0,
        batch_size: Optional[int] = None, drop_last: Optional[bool] = None,
    ) -> Iterator[Batch]:
        samples = getattr(self, split)
        train_like = split == "train"
        bs = batch_size or (
            self.cfg.train.batch_size if train_like else self.cfg.train.eval_batch_size
        )
        return make_iterator(
            samples,
            self.text_encoder,
            self.answer_vocab,
            self.cache,
            batch_size=bs,
            max_len=self.cfg.model.max_question_len,
            shuffle=shuffle if shuffle else train_like,
            seed=seed,
            drop_last=train_like if drop_last is None else drop_last,
            prefetch=max(self.cfg.data.num_workers, 1),
        )

    def steps(self, split: str, batch_size: Optional[int] = None) -> int:
        train_like = split == "train"
        bs = batch_size or (
            self.cfg.train.batch_size if train_like else self.cfg.train.eval_batch_size
        )
        return steps_per_epoch(len(getattr(self, split)), bs, train_like)

    def save_vocabs(self, directory: str | Path) -> None:
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        self.answer_vocab.save(d / "answer_vocab.json")
        if isinstance(self.text_encoder, WordVocab):
            self.text_encoder.save(d / "question_vocab.json")
        elif isinstance(self.text_encoder, WordPieceTokenizer):
            self.text_encoder.save(d / "wordpiece_vocab.txt")


def build_data(cfg: Config, bert_vocab_file: Optional[str] = None) -> DataModule:
    train = load_dataset(cfg.data, "train")
    try:
        val = load_dataset(cfg.data, "val")
    except (FileNotFoundError, KeyError):
        val = load_dataset(cfg.data, "test")
    test = load_dataset(cfg.data, "test")

    questions = [s.question for s in train]
    if cfg.model.question_encoder == "lstm":
        text_encoder = WordVocab.build(
            questions, max_size=cfg.model.question_vocab_size
        )
    else:
        if bert_vocab_file and Path(bert_vocab_file).exists():
            text_encoder = WordPieceTokenizer.from_vocab_file(bert_vocab_file)
        else:
            # No pretrained vocab on this machine [SURVEY §7.1]; corpus
            # WordPiece keeps the BERT path trainable end-to-end.
            text_encoder = WordPieceTokenizer.toy_vocab(
                questions, max_size=cfg.model.bert_vocab_size
            )

    top_k = cfg.data.answer_top_k or cfg.model.answer_vocab_size
    answer_vocab = AnswerVocab.build(
        (s.answer for s in train), top_k=min(top_k, cfg.model.answer_vocab_size)
    )

    dm = DataModule(
        cfg=cfg,
        train=train,
        val=val,
        test=test,
        text_encoder=text_encoder,
        answer_vocab=answer_vocab,
        cache=ImageCache(max(256, cfg.model.image_size)),
    )
    return dm
