"""Public inference API — the replication contract [B:5, SURVEY §3.3]:

    predict(image, question) → answer logits

plus the batched multi-question-per-image variant (encode the image ONCE,
fan the questions out through BTIA + the AD head) [B:5, B:11].

Compiled programs are cached per (batch, question-fanout) bucket; question
counts are padded up to the next bucket so a serving process compiles a
handful of programs, not one per request shape.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from btia_tpu.configs.config import Config
from btia_tpu.data.image import load_ingest_image
from btia_tpu.data.vocab import AnswerVocab, WordVocab
from btia_tpu.data.wordpiece import WordPieceTokenizer
from btia_tpu.models.model import BTIAADNet, build_model

ImageLike = Union[str, Path, bytes, np.ndarray]


def _bucket(n: int, buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // buckets[-1]) * buckets[-1]


class Predictor:
    def __init__(
        self,
        model: BTIAADNet,
        variables: dict,
        text_encoder,
        answer_vocab: AnswerVocab,
        cfg: Config,
        mesh=None,
    ):
        """`mesh` (optional jax.sharding.Mesh): serve through a DP×TP
        device mesh [B:5 "on v5e-8", B:11]. Params get the TP layout from
        parallel/sharding.py (replicated when model axis == 1); every
        compiled fan-out program constrains its batch-shaped inputs over
        the 'data' axis, so the SAME host loop (StreamingServer: decode
        threads, dedup, pair packing, topk, error isolation) drives the
        whole slice — XLA inserts the TP all-reduces over ICI."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from btia_tpu.infer.sharded import shard_serving_params

            variables = shard_serving_params(variables, mesh)
        self.variables = variables
        self.text_encoder = text_encoder
        self.answer_vocab = answer_vocab
        self.cfg = cfg
        self.ingest_size = max(256, cfg.model.image_size)
        self._forward_cache: Dict[Tuple[int, int], jax.stages.Wrapped] = {}

        def _encode_body(v, imgs):
            # ALL mesh-traced programs go through _fused_ctx so the fused
            # Pallas kernels only ever partition via explicit shard_map,
            # never bare pjit (ADVICE r3 medium: this class used to skip
            # the guard that train/steps.py and infer/sharded.py apply).
            with self._fused_ctx():
                return self.model.apply(
                    v, self._constrain(imgs), method="encode_image"
                )

        self._encode = jax.jit(_encode_body)

    def _fused_ctx(self):
        from btia_tpu.ops.fused_attn import fused_mesh

        return fused_mesh(self.mesh)

    def _constrain(self, x: jax.Array) -> jax.Array:
        """Shard a batch-shaped array's leading dim over 'data' when a
        mesh is set AND the dim divides the axis (a 1-image predict()
        stays replicated rather than failing the divisibility check)."""
        if self.mesh is None:
            return x
        from btia_tpu.parallel.mesh import DATA_AXIS
        from btia_tpu.parallel.sharding import batch_sharding, replicated

        dp = self.mesh.shape[DATA_AXIS]
        if x.ndim and x.shape[0] % dp == 0:
            return jax.lax.with_sharding_constraint(x, batch_sharding(self.mesh))
        return jax.lax.with_sharding_constraint(x, replicated(self.mesh))

    # -- plumbing ---------------------------------------------------------

    @classmethod
    def from_checkpoint(
        cls, workdir: str | Path, best: bool = True, mesh=None
    ) -> "Predictor":
        """Load config + vocabs + best/latest weights from a Trainer workdir."""
        from btia_tpu.parallel.mesh import single_device_mesh
        from btia_tpu.train.checkpoint import Checkpointer
        from btia_tpu.train.steps import create_state

        workdir = Path(workdir)
        ckpt = Checkpointer(workdir / "checkpoints")
        cfg = ckpt.load_config()
        model = build_model(cfg.model)
        mesh = single_device_mesh()
        state = create_state(model, cfg, mesh, steps_per_epoch=1)
        state = ckpt.restore(state, best=best)

        vocab_dir = workdir / "vocabs"
        answer_vocab = AnswerVocab.load(vocab_dir / "answer_vocab.json")
        if (vocab_dir / "question_vocab.json").exists():
            text_encoder = WordVocab.load(vocab_dir / "question_vocab.json")
        else:
            text_encoder = WordPieceTokenizer.from_vocab_file(
                vocab_dir / "wordpiece_vocab.txt"
            )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return cls(model, variables, text_encoder, answer_vocab, cfg, mesh=mesh)

    def _prep_image(self, image: ImageLike) -> np.ndarray:
        if isinstance(image, np.ndarray):
            if image.ndim == 2:
                image = np.repeat(image[:, :, None], 3, axis=2)
            if image.shape[:2] != (self.ingest_size, self.ingest_size):
                from btia_tpu.data.image import resize_uint8

                image = resize_uint8(image.astype(np.uint8), self.ingest_size)
            return image.astype(np.uint8)
        return load_ingest_image(image, self.ingest_size)

    def _tokenize(self, questions: Sequence[str]) -> np.ndarray:
        L = self.cfg.model.max_question_len
        return np.asarray(
            [self.text_encoder.encode(q, L) for q in questions], np.int32
        )

    def _fanout_forward(self, B: int, Q: int):
        key = (B, Q)
        if key not in self._forward_cache:

            def fwd(variables, images, qids):
                with self._fused_ctx():
                    img_tokens = self.model.apply(
                        variables, self._constrain(images), method="encode_image"
                    )
                    return self.model.apply(
                        variables,
                        img_tokens,
                        self._constrain(qids),
                        method="answer_questions",
                    )

            self._forward_cache[key] = jax.jit(fwd)
        return self._forward_cache[key]

    def _pairs_forward(self, B: int, U: int, P: int):
        """Packed pair-list fan-out: P (image, question) pairs over B
        encoded images and U unique questions (see answer_pairs). One
        compiled program per (B, U, P) bucket."""
        key = (B, U, P, "pairs")
        if key not in self._forward_cache:

            def fwd(variables, images, unique_ids, pair_img, pair_q):
                with self._fused_ctx():
                    img_tokens = self.model.apply(
                        variables, self._constrain(images), method="encode_image"
                    )
                    return self.model.apply(
                        variables,
                        img_tokens,
                        self._constrain(unique_ids),
                        self._constrain(pair_img),
                        self._constrain(pair_q),
                        method="answer_pairs",
                    )

            self._forward_cache[key] = jax.jit(fwd)
        return self._forward_cache[key]

    def _fanout_forward_indexed(self, B: int, Q: int, U: int):
        """Deduplicated fan-out: encode U unique questions, gather per
        (image, question) pair via an index map. One compiled program per
        (B, Q, U) bucket; exact same logits as the plain path."""
        key = (B, Q, U, "indexed")
        if key not in self._forward_cache:

            def fwd(variables, images, unique_ids, qmap):
                with self._fused_ctx():
                    img_tokens = self.model.apply(
                        variables, self._constrain(images), method="encode_image"
                    )
                    return self.model.apply(
                        variables,
                        img_tokens,
                        self._constrain(unique_ids),
                        self._constrain(qmap),
                        method="answer_questions_indexed",
                    )

            self._forward_cache[key] = jax.jit(fwd)
        return self._forward_cache[key]

    # -- public API [B:5] --------------------------------------------------

    def predict(self, image: ImageLike, question: str) -> np.ndarray:
        """(image, question) → answer logits, shape (vocab,)."""
        return self.predict_batch(image, [question])[0]

    def predict_batch(
        self, image: ImageLike, questions: Sequence[str]
    ) -> np.ndarray:
        """Many questions, ONE image encode [B:5]. → (len(questions), vocab)."""
        n = len(questions)
        Q = _bucket(n)
        qids = np.zeros((1, Q, self.cfg.model.max_question_len), np.int32)
        qids[0, :n] = self._tokenize(questions)
        images = self._prep_image(image)[None]
        logits = self._fanout_forward(1, Q)(self.variables, images, qids)
        return np.asarray(jax.device_get(logits))[0, :n]

    def predict_answers(
        self, image: ImageLike, questions: Sequence[str]
    ) -> List[str]:
        """Decoded answer strings for many questions, ONE image encode —
        the string-level counterpart of predict_batch."""
        from btia_tpu.ops.answers import argmax_real, real_limit

        logits = self.predict_batch(image, questions)
        limit = real_limit(len(self.answer_vocab), logits.shape[-1])
        return [
            self.answer_vocab.decode(int(i))
            for i in argmax_real(logits, limit)
        ]

    def predict_answer(self, image: ImageLike, question: str) -> str:
        from btia_tpu.ops.answers import argmax_real, real_limit

        logits = self.predict(image, question)
        limit = real_limit(len(self.answer_vocab), logits.shape[-1])
        return self.answer_vocab.decode(int(argmax_real(logits, limit)))


def predict(
    image: ImageLike, question: str, workdir: str | Path, best: bool = True
) -> np.ndarray:
    """One-shot convenience wrapper over Predictor [B:5]."""
    return Predictor.from_checkpoint(workdir, best=best).predict(image, question)
