"""BTIAADNet — config-driven full-model assembly [SURVEY §2.1, B:6–11].

Wires {ResNet-50 | ViT-B/16 | ViT-L/336} × {LSTM | BERT} × BTIA fusion ×
{AD head | MLP classifier}. The on-device ingest transform (resize +
normalize, ops.ingest) runs INSIDE the model so it jits/fuses with the
encoder [B:5].

Separate `encode_image` / `answer_questions` methods expose the
encode-image-once → fan-out-questions split used by batched
multi-question-per-image inference [B:5, B:11].
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from btia_tpu.configs.config import ModelConfig
from btia_tpu.core.dtypes import DTypePolicy, default_policy
from btia_tpu.models.bert import BertQuestionEncoder, BertSpec
from btia_tpu.models.btia import BTIA
from btia_tpu.models.heads import ADHead, SimpleClassifier
from btia_tpu.models.layers import LayerNorm
from btia_tpu.models.lstm import LSTMQuestionEncoder
from btia_tpu.models.resnet import build_resnet
from btia_tpu.models.vit import build_vit
from btia_tpu.ops.ingest import preprocess_images


class BTIAADNet(nn.Module):
    cfg: ModelConfig

    @property
    def policy(self) -> DTypePolicy:
        import dataclasses

        p = default_policy(self.cfg.mixed_precision)
        if self.cfg.int8_ffn and self.cfg.mixed_precision:
            p = dataclasses.replace(p, int8=True)
        return p

    def setup(self):
        cfg, policy = self.cfg, self.policy
        if cfg.image_encoder.startswith("resnet"):
            self.image_encoder = build_resnet(cfg.image_encoder, policy)
        else:
            self.image_encoder = build_vit(
                cfg.image_encoder, policy, cfg.dropout, remat=cfg.remat
            )
        if cfg.question_encoder == "lstm":
            self.question_encoder = LSTMQuestionEncoder(
                vocab_size=cfg.question_vocab_size,
                embed_dim=cfg.word_embed_dim,
                hidden=cfg.lstm_hidden,
                bidirectional=cfg.lstm_bidirectional,
                policy=policy,
                dropout=cfg.dropout,
            )
        else:
            self.question_encoder = BertQuestionEncoder(
                spec=BertSpec(
                    vocab_size=cfg.bert_vocab_size,
                    dim=cfg.bert_hidden,
                    depth=cfg.bert_layers,
                    num_heads=cfg.bert_heads,
                    mlp_dim=4 * cfg.bert_hidden,
                ),
                policy=policy,
                dropout=cfg.dropout,
            )
        self.img_proj = nn.Dense(
            cfg.hidden_dim,
            name="img_proj",
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
        )
        self.txt_proj = nn.Dense(
            cfg.hidden_dim,
            name="txt_proj",
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
        )
        self.img_ln = LayerNorm(policy, name="img_ln")
        self.txt_ln = LayerNorm(policy, name="txt_ln")
        self.btia = BTIA(
            dim=cfg.hidden_dim,
            num_heads=cfg.num_heads,
            num_layers=cfg.btia_layers,
            mlp_ratio=cfg.mlp_ratio,
            policy=policy,
            dropout=cfg.dropout,
            remat=cfg.remat,
        )
        if cfg.head == "ad":
            self.head = ADHead(
                dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                vocab_size=cfg.answer_vocab_size,
                num_queries=cfg.num_answer_queries,
                policy=policy,
                dropout=cfg.dropout,
            )
        else:
            self.head = SimpleClassifier(
                dim=cfg.hidden_dim,
                vocab_size=cfg.answer_vocab_size,
                policy=policy,
                dropout=cfg.dropout,
            )

    # ---- staged API (encode once, fan out questions) ---------------------

    def _pool_image_tokens(self, feats: jax.Array) -> jax.Array:
        """Bilinear-downsample the patch/grid tokens to (g, g) via two MXU
        matmuls (keeps a ViT CLS token untouched). See ModelConfig
        .image_pool_grid — the fan-out throughput lever [B:11]."""
        gt = self.cfg.image_pool_grid
        if not gt:
            return feats
        has_cls = not self.cfg.image_encoder.startswith("resnet")
        cls, grid = (feats[:, :1], feats[:, 1:]) if has_cls else (None, feats)
        B, N, D = grid.shape
        g = int(round(N**0.5))
        if g <= gt:
            return feats
        from btia_tpu.ops.ingest import _resize_matrix

        m = jnp.asarray(_resize_matrix(g, gt)).astype(grid.dtype)
        x = grid.reshape(B, g, g, D)
        x = jnp.einsum("hH,bHwc->bhwc", m, x)
        x = jnp.einsum("wW,bhWc->bhwc", m, x)
        x = x.reshape(B, gt * gt, D)
        return jnp.concatenate([cls, x], axis=1) if has_cls else x

    def encode_image(self, images: jax.Array, train: bool = False) -> jax.Array:
        """images: uint8/float (B, H, W, 3), any size → (B, N_img, hidden)."""
        s = self.cfg.image_size
        x = preprocess_images(
            images, (s, s), out_dtype=self.policy.compute_dtype
        )
        feats = self.image_encoder(x, train=train)
        feats = self._pool_image_tokens(feats)
        return self.img_ln(self.img_proj(feats))

    def encode_question(
        self,
        question_ids: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        feats, mask = self.question_encoder(question_ids, mask, train=train)
        return self.txt_ln(self.txt_proj(feats)), mask

    def fuse_and_answer(
        self,
        img_tokens: jax.Array,
        txt_tokens: jax.Array,
        txt_mask: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        img_f, txt_f = self.btia(
            img_tokens, txt_tokens, txt_mask, deterministic=not train
        )
        if self.cfg.head == "ad":
            tokens = jnp.concatenate([img_f, txt_f], axis=1)
            img_valid = jnp.ones(img_f.shape[:2], bool)
            token_mask = jnp.concatenate([img_valid, txt_mask], axis=1)
            return self.head(tokens, token_mask, deterministic=not train)
        return self.head(img_f, txt_f, txt_mask, deterministic=not train)

    def answer_questions(
        self,
        img_tokens: jax.Array,  # (B, N_img, hidden) from encode_image
        question_ids: jax.Array,  # (B, Q, S)
        q_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """Fan out Q questions per already-encoded image → (B, Q, vocab).

        The image encoder runs ONCE per image; only the (cheap) question
        encoder + fusion + head replicate per question [B:5, B:11].
        """
        B, Q, S = question_ids.shape
        flat_ids = question_ids.reshape(B * Q, S)
        flat_mask = q_mask.reshape(B * Q, S) if q_mask is not None else None
        txt, txt_mask = self.encode_question(flat_ids, flat_mask, train)
        n_img, d = img_tokens.shape[1], img_tokens.shape[2]
        img_rep = jnp.broadcast_to(
            img_tokens[:, None], (B, Q, n_img, d)
        ).reshape(B * Q, n_img, d)
        logits = self.fuse_and_answer(img_rep, txt, txt_mask, train)
        return logits.reshape(B, Q, -1)

    def answer_questions_indexed(
        self,
        img_tokens: jax.Array,  # (B, N_img, hidden) from encode_image
        unique_ids: jax.Array,  # (U, S) deduplicated question token rows
        qmap: jax.Array,  # (B, Q) int32 indices into the U axis
        train: bool = False,
    ) -> jax.Array:
        """`answer_questions` with the question tower deduplicated.

        Question encoding depends only on the question, yet the plain
        fan-out re-encodes it per (image, question) pair — at B=16, Q=128
        the BERT tower is ~37% of the serving step (profiled, BENCH_NOTES
        r2) and serving question distributions are template-heavy, so most
        of that is re-encoding identical token rows. Here the caller
        passes the U unique rows plus an index map; the tower runs U times
        instead of B*Q, and per-pair features are gathered. Exact — each
        row's encoding is independent of its batch neighbours, so logits
        match `answer_questions` bit-for-bit shapes aside.
        """
        B, Q = qmap.shape
        txt_u, mask_u = self.encode_question(unique_ids, None, train)
        flat = qmap.reshape(B * Q)
        txt = jnp.take(txt_u, flat, axis=0)
        txt_mask = jnp.take(mask_u, flat, axis=0)
        n_img, d = img_tokens.shape[1], img_tokens.shape[2]
        img_rep = jnp.broadcast_to(
            img_tokens[:, None], (B, Q, n_img, d)
        ).reshape(B * Q, n_img, d)
        logits = self.fuse_and_answer(img_rep, txt, txt_mask, train)
        return logits.reshape(B, Q, -1)

    def answer_pairs(
        self,
        img_tokens: jax.Array,  # (B, N_img, hidden) from encode_image
        unique_ids: jax.Array,  # (U, S) deduplicated question token rows
        pair_img: jax.Array,  # (P,) int32 image index per pair
        pair_q: jax.Array,  # (P,) int32 unique-question index per pair
        train: bool = False,
    ) -> jax.Array:
        """Fully packed pair-list fan-out → (P, vocab).

        The most general serving entry: each of the P (image, question)
        pairs names an image slot and a unique-question slot, so uneven
        question counts per image pack densely instead of padding every
        image to a fixed Q (the scheduler fills P = sum(n_i) slots,
        bucketed). Static shapes throughout — B, U, P are compile-time;
        the gathers are cheap HBM reads next to the per-pair fusion cost.
        """
        txt_u, mask_u = self.encode_question(unique_ids, None, train)
        txt = jnp.take(txt_u, pair_q, axis=0)
        txt_mask = jnp.take(mask_u, pair_q, axis=0)
        img = jnp.take(img_tokens, pair_img, axis=0)
        return self.fuse_and_answer(img, txt, txt_mask, train)

    def __call__(
        self,
        images: jax.Array,
        question_ids: jax.Array,
        q_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """The reference forward contract: (image, question) → answer logits
        [B:5]. images (B,H,W,3); question_ids (B,S) → (B, vocab)."""
        img = self.encode_image(images, train)
        txt, txt_mask = self.encode_question(question_ids, q_mask, train)
        return self.fuse_and_answer(img, txt, txt_mask, train)


def build_model(cfg: ModelConfig) -> BTIAADNet:
    cfg.validate()
    return BTIAADNet(cfg=cfg)
