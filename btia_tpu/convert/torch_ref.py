"""Faithful PyTorch re-statement of BTIA-AD-Net — the parity oracle
[SURVEY §3.4, §7.2 PR2].

No reference weights or code exist on this machine (SURVEY §0), so parity
is defined against this architecture-identical PyTorch model: identical
module structure, naming (mirrors the Flax param tree for a mechanical
name-map), gate ordering, epsilons, GELU variant (exact/erf), resize
convention, and attention math. When the driver supplies real reference
checkpoints, the converter's name-map table (convert.py) absorbs any
renames without code changes [SURVEY §7.3].

CPU-only torch (2.13.0+cpu) — used exclusively for conversion + golden
tests, never in the TPU serving path.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from btia_tpu.configs.config import ModelConfig
from btia_tpu.models.resnet import STAGE_SIZES
from btia_tpu.models.vit import VIT_SPECS
from btia_tpu.ops.ingest import IMAGENET_MEAN, IMAGENET_STD, _resize_matrix

_NEG_INF = -1e9


def _gelu(x: torch.Tensor) -> torch.Tensor:
    return F.gelu(x)  # exact erf — matches flax nn.gelu(approximate=False)


def _attn(q, k, v, kv_mask: Optional[torch.Tensor]) -> torch.Tensor:
    """(B,H,S,D) attention, fp32 softmax — mirrors ops.attention.mha_reference."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = torch.einsum("bhqd,bhkd->bhqk", q.float(), k.float()) * scale
    if kv_mask is not None:
        bias = torch.where(kv_mask, 0.0, _NEG_INF).float()
        s = s + bias[:, None, None, :]
    p = torch.softmax(s, dim=-1)
    return torch.einsum("bhqk,bhkd->bhqd", p, v.float())


def _split_heads(x: torch.Tensor, h: int) -> torch.Tensor:
    B, S, D = x.shape
    return x.view(B, S, h, D // h).permute(0, 2, 1, 3)


def _merge_heads(x: torch.Tensor) -> torch.Tensor:
    B, H, S, Dh = x.shape
    return x.permute(0, 2, 1, 3).reshape(B, S, H * Dh)


class TorchMHA(nn.Module):
    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.o_proj = nn.Linear(dim, dim)

    def forward(self, x_q, x_kv=None, kv_mask=None):
        x_kv = x_q if x_kv is None else x_kv
        q = _split_heads(self.q_proj(x_q), self.num_heads)
        k = _split_heads(self.k_proj(x_kv), self.num_heads)
        v = _split_heads(self.v_proj(x_kv), self.num_heads)
        return self.o_proj(_merge_heads(_attn(q, k, v, kv_mask)))


class TorchMlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(_gelu(self.fc1(x)))


# ---------------------------------------------------------------------------
# ResNet (NCHW internally; token output matches flax NHWC reshape)
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    def __init__(self, cin: int, features: int, stride: int):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, features, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(features, eps=1e-5, momentum=0.1)
        self.conv2 = nn.Conv2d(features, features, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(features, eps=1e-5, momentum=0.1)
        self.conv3 = nn.Conv2d(features, 4 * features, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(4 * features, eps=1e-5, momentum=0.1)
        self.has_downsample = cin != 4 * features or stride != 1
        if self.has_downsample:
            self.downsample_conv = nn.Conv2d(cin, 4 * features, 1, stride, bias=False)
            self.downsample_bn = nn.BatchNorm2d(4 * features, eps=1e-5, momentum=0.1)

    def forward(self, x):
        r = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.has_downsample:
            r = self.downsample_bn(self.downsample_conv(r))
        return F.relu(y + r)


class TorchResNet(nn.Module):
    def __init__(self, stage_sizes):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.stem_bn = nn.BatchNorm2d(64, eps=1e-5, momentum=0.1)
        cin = 64
        for stage, num_blocks in enumerate(stage_sizes):
            for block in range(num_blocks):
                feats = 64 * 2**stage
                stride = 2 if (block == 0 and stage > 0) else 1
                setattr(
                    self,
                    f"stage{stage + 1}_block{block}",
                    TorchBottleneck(cin, feats, stride),
                )
                cin = 4 * feats
        self.stage_sizes = stage_sizes

    def forward(self, x_nhwc):
        x = x_nhwc.permute(0, 3, 1, 2)
        x = F.relu(self.stem_bn(self.stem_conv(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                x = getattr(self, f"stage{stage + 1}_block{block}")(x)
        B, C, H, W = x.shape
        return x.permute(0, 2, 3, 1).reshape(B, H * W, C)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------


class TorchViTBlock(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: float):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchMHA(dim, heads)
        self.ln2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        return x + self.mlp(self.ln2(x))


class TorchViT(nn.Module):
    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        self.patch_embed = nn.Linear(spec.patch_size**2 * 3, spec.dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, spec.dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, spec.num_tokens, spec.dim))
        for i in range(spec.depth):
            setattr(
                self, f"block{i}", TorchViTBlock(spec.dim, spec.num_heads, spec.mlp_ratio)
            )
        self.ln_final = nn.LayerNorm(spec.dim, eps=1e-6)

    def forward(self, x_nhwc):
        s = self.spec
        B = x_nhwc.shape[0]
        g, p = s.grid, s.patch_size
        x = x_nhwc.view(B, g, p, g, p, 3).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g * g, p * p * 3)
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for i in range(s.depth):
            x = getattr(self, f"block{i}")(x)
        return self.ln_final(x)


# ---------------------------------------------------------------------------
# Question encoders
# ---------------------------------------------------------------------------


class TorchLSTMLayer(nn.Module):
    def __init__(self, in_dim: int, hidden: int, reverse: bool):
        super().__init__()
        self.hidden = hidden
        self.reverse = reverse
        self.ih = nn.Linear(in_dim, 4 * hidden)
        self.hh_kernel = nn.Parameter(torch.zeros(hidden, 4 * hidden))
        self.hh_bias = nn.Parameter(torch.zeros(4 * hidden))

    def forward(self, x, mask):
        B, S, _ = x.shape
        xz = self.ih(x)
        h = x.new_zeros(B, self.hidden)
        c = x.new_zeros(B, self.hidden)
        outs = [None] * S
        steps = range(S - 1, -1, -1) if self.reverse else range(S)
        for t in steps:
            z = xz[:, t] + h @ self.hh_kernel + self.hh_bias
            i, f, g, o = z.chunk(4, dim=-1)
            i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
            g = torch.tanh(g)
            c_new = f * c + i * g
            h_new = o * torch.tanh(c_new)
            m = mask[:, t : t + 1].float()
            h = m * h_new + (1 - m) * h
            c = m * c_new + (1 - m) * c
            outs[t] = h
        return torch.stack(outs, dim=1)


class TorchLSTMEncoder(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.word_embed = nn.Embedding(cfg.question_vocab_size, cfg.word_embed_dim)
        self.fwd = TorchLSTMLayer(cfg.word_embed_dim, cfg.lstm_hidden, False)
        self.bidirectional = cfg.lstm_bidirectional
        if self.bidirectional:
            self.bwd = TorchLSTMLayer(cfg.word_embed_dim, cfg.lstm_hidden, True)

    def forward(self, ids):
        mask = ids > 0
        emb = self.word_embed(ids)
        out = self.fwd(emb, mask)
        if self.bidirectional:
            out = torch.cat([out, self.bwd(emb, mask)], dim=-1)
        return out, mask


class TorchBertLayer(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_dim: int):
        super().__init__()
        self.attn = TorchMHA(dim, heads)
        self.ln_attn = nn.LayerNorm(dim, eps=1e-12)
        self.mlp = TorchMlp(dim, mlp_dim)
        self.ln_mlp = nn.LayerNorm(dim, eps=1e-12)

    def forward(self, x, mask):
        x = self.ln_attn(x + self.attn(x, kv_mask=mask))
        return self.ln_mlp(x + self.mlp(x))


class TorchBertEncoder(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        dim = cfg.bert_hidden
        self.depth = cfg.bert_layers
        self.word_embed = nn.Embedding(cfg.bert_vocab_size, dim)
        self.pos_embed = nn.Embedding(512, dim)
        self.type_embed = nn.Embedding(2, dim)
        self.ln_embed = nn.LayerNorm(dim, eps=1e-12)
        for i in range(self.depth):
            setattr(
                self,
                f"layer{i}",
                TorchBertLayer(dim, cfg.bert_heads, dim * 4),
            )

    def forward(self, ids):
        mask = ids > 0
        B, S = ids.shape
        pos = torch.arange(S, device=ids.device)[None, :].expand(B, S)
        x = (
            self.word_embed(ids)
            + self.pos_embed(pos)
            + self.type_embed(torch.zeros_like(ids))
        )
        x = self.ln_embed(x)
        for i in range(self.depth):
            x = getattr(self, f"layer{i}")(x, mask)
        return x, mask


# ---------------------------------------------------------------------------
# BTIA + heads
# ---------------------------------------------------------------------------


class TorchBTIALayer(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: float):
        super().__init__()
        self.num_heads = heads
        self.ln_img = nn.LayerNorm(dim, eps=1e-6)
        self.ln_txt = nn.LayerNorm(dim, eps=1e-6)
        for name in (
            "i2t_q_proj", "i2t_k_proj", "i2t_v_proj", "i2t_o_proj",
            "t2i_q_proj", "t2i_k_proj", "t2i_v_proj", "t2i_o_proj",
        ):
            setattr(self, name, nn.Linear(dim, dim))
        self.ln_img2 = nn.LayerNorm(dim, eps=1e-6)
        self.ln_txt2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_img = TorchMlp(dim, int(dim * mlp_ratio))
        self.mlp_txt = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, img, txt, txt_mask):
        h = self.num_heads
        img_n, txt_n = self.ln_img(img), self.ln_txt(txt)
        qi = _split_heads(self.i2t_q_proj(img_n), h)
        kt = _split_heads(self.i2t_k_proj(txt_n), h)
        vt = _split_heads(self.i2t_v_proj(txt_n), h)
        qt = _split_heads(self.t2i_q_proj(txt_n), h)
        ki = _split_heads(self.t2i_k_proj(img_n), h)
        vi = _split_heads(self.t2i_v_proj(img_n), h)
        img = img + self.i2t_o_proj(_merge_heads(_attn(qi, kt, vt, txt_mask)))
        txt = txt + self.t2i_o_proj(_merge_heads(_attn(qt, ki, vi, None)))
        img = img + self.mlp_img(self.ln_img2(img))
        txt = txt + self.mlp_txt(self.ln_txt2(txt))
        return img, txt


class TorchBTIA(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.depth = cfg.btia_layers
        for i in range(self.depth):
            setattr(
                self,
                f"layer{i}",
                TorchBTIALayer(cfg.hidden_dim, cfg.num_heads, cfg.mlp_ratio),
            )

    def forward(self, img, txt, txt_mask):
        for i in range(self.depth):
            img, txt = getattr(self, f"layer{i}")(img, txt, txt_mask)
        return img, txt


class TorchADHead(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        dim, heads = cfg.hidden_dim, cfg.num_heads
        self.num_heads = heads
        self.num_queries = cfg.num_answer_queries
        K = self.num_queries or cfg.answer_vocab_size
        self.answer_queries = nn.Parameter(torch.zeros(K, dim))
        self.ln_kv = nn.LayerNorm(dim, eps=1e-6)
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.o_proj = nn.Linear(dim, dim)
        self.ln_mlp = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * 2.0))
        self.ln_out = nn.LayerNorm(dim, eps=1e-6)
        if self.num_queries == 0:
            self.answer_weights = nn.Parameter(torch.zeros(cfg.answer_vocab_size, dim))
        else:
            self.answer_table = nn.Parameter(torch.zeros(cfg.answer_vocab_size, dim))
        self.answer_bias = nn.Parameter(torch.zeros(cfg.answer_vocab_size))

    def forward(self, tokens, token_mask):
        B = tokens.shape[0]
        qt = self.answer_queries[None].expand(B, -1, -1)
        kv = self.ln_kv(tokens)
        q = _split_heads(self.q_proj(qt), self.num_heads)
        k = _split_heads(self.k_proj(kv), self.num_heads)
        v = _split_heads(self.v_proj(kv), self.num_heads)
        feats = qt + self.o_proj(_merge_heads(_attn(q, k, v, token_mask)))
        feats = feats + self.mlp(self.ln_mlp(feats))
        feats = self.ln_out(feats)
        if self.num_queries == 0:
            return torch.einsum("bad,ad->ba", feats, self.answer_weights) + self.answer_bias
        pooled = feats.mean(dim=1)
        return pooled @ self.answer_table.T + self.answer_bias


class TorchSimpleClassifier(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        dim = cfg.hidden_dim
        self.fc1 = nn.Linear(2 * dim, int(dim * 2.0))
        self.fc_out = nn.Linear(int(dim * 2.0), cfg.answer_vocab_size)

    def forward(self, img, txt, txt_mask):
        img_pooled = img.mean(dim=1)
        m = txt_mask.float()[:, :, None]
        txt_pooled = (txt * m).sum(1) / m.sum(1).clamp(min=1.0)
        joint = torch.cat([img_pooled, txt_pooled], dim=-1)
        return self.fc_out(_gelu(self.fc1(joint)))


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class TorchBTIAADNet(nn.Module):
    """Forward-contract mirror of models.model.BTIAADNet (eval mode)."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        if cfg.image_encoder.startswith("resnet"):
            self.image_encoder = TorchResNet(STAGE_SIZES[cfg.image_encoder])
        else:
            self.image_encoder = TorchViT(VIT_SPECS[cfg.image_encoder])
        if cfg.question_encoder == "lstm":
            self.question_encoder = TorchLSTMEncoder(cfg)
        else:
            self.question_encoder = TorchBertEncoder(cfg)
        self.img_proj = nn.Linear(cfg.image_dim, cfg.hidden_dim)
        self.txt_proj = nn.Linear(
            2 * cfg.lstm_hidden
            if cfg.question_encoder == "lstm" and cfg.lstm_bidirectional
            else (cfg.lstm_hidden if cfg.question_encoder == "lstm" else cfg.bert_hidden),
            cfg.hidden_dim,
        )
        self.img_ln = nn.LayerNorm(cfg.hidden_dim, eps=1e-6)
        self.txt_ln = nn.LayerNorm(cfg.hidden_dim, eps=1e-6)
        self.btia = TorchBTIA(cfg)
        if cfg.head == "ad":
            self.head = TorchADHead(cfg)
        else:
            self.head = TorchSimpleClassifier(cfg)

    def preprocess(self, images_u8: torch.Tensor) -> torch.Tensor:
        """uint8 NHWC → resized/normalized NHWC, same matrices as ops/ingest."""
        s = self.cfg.image_size
        x = images_u8.float()
        mh = torch.from_numpy(np.asarray(_resize_matrix(x.shape[1], s)))
        mw = torch.from_numpy(np.asarray(_resize_matrix(x.shape[2], s)))
        x = torch.einsum("hH,bHwc->bhwc", mh, x)
        x = torch.einsum("wW,bhWc->bhwc", mw, x)
        mean = torch.tensor(IMAGENET_MEAN)
        std = torch.tensor(IMAGENET_STD)
        return (x / 255.0 - mean) / std

    def _pool_image_tokens(self, feats: torch.Tensor) -> torch.Tensor:
        gt = self.cfg.image_pool_grid
        if not gt:
            return feats
        has_cls = not self.cfg.image_encoder.startswith("resnet")
        cls, grid = (feats[:, :1], feats[:, 1:]) if has_cls else (None, feats)
        B, N, D = grid.shape
        g = int(round(N**0.5))
        if g <= gt:
            return feats
        m = torch.from_numpy(np.asarray(_resize_matrix(g, gt)))
        x = grid.reshape(B, g, g, D)
        x = torch.einsum("hH,bHwc->bhwc", m, x)
        x = torch.einsum("wW,bhWc->bhwc", m, x)
        x = x.reshape(B, gt * gt, D)
        return torch.cat([cls, x], dim=1) if has_cls else x

    @torch.no_grad()
    def forward(self, images_u8: torch.Tensor, question_ids: torch.Tensor):
        self.eval()
        x = self.preprocess(images_u8)
        img = self.image_encoder(x)
        img = self.img_ln(self.img_proj(self._pool_image_tokens(img)))
        txt_feats, mask = self.question_encoder(question_ids)
        txt = self.txt_ln(self.txt_proj(txt_feats))
        img, txt = self.btia(img, txt, mask)
        if self.cfg.head == "ad":
            tokens = torch.cat([img, txt], dim=1)
            img_valid = torch.ones(img.shape[:2], dtype=torch.bool)
            token_mask = torch.cat([img_valid, mask], dim=1)
            return self.head(tokens, token_mask)
        return self.head(img, txt, mask)


def build_torch_model(cfg: ModelConfig, seed: int = 0) -> TorchBTIAADNet:
    torch.manual_seed(seed)
    model = TorchBTIAADNet(cfg)
    # Non-degenerate init for the zero-initialized Parameters so parity
    # tests exercise real compute paths.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim >= 2 and p.abs().sum() == 0:
                p.normal_(0.0, 0.02)
    model.eval()
    return model
