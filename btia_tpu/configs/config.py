"""Typed config system + registry of the five reference configs [B:6–11].

The reference drives everything from argparse flags [SURVEY §2.3]; here each
published configuration is a frozen dataclass registered by name, overridable
with ``key=value`` dotted strings from the CLI, and serialized into every
checkpoint for reproducibility [SURVEY §5.6].
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Dict, Optional, Tuple

# ---------------------------------------------------------------------------
# Encoder geometry tables
# ---------------------------------------------------------------------------

IMAGE_ENCODERS = {
    # name: (feature_dim, image_size, num_tokens)
    "resnet50": (2048, 224, 49),  # 7x7 grid features [B:7]
    "vit_b16": (768, 224, 197),  # 196 patches + CLS [B:9]
    "vit_l336": (1024, 336, 577),  # 576 patches + CLS, patch 14 [B:11]
    "resnet_tiny": (2048, 64, 4),  # 1-block stages @64px — tests/CI only
    "resnet_small": (1024, 128, 64),  # 3-stage @128px → 8x8 grid (studies)
    "resnet_xsmall": (512, 128, 256),  # 2-stage @128px → 16x16 grid (studies)
    "vit_test": (64, 96, 145),  # 12x12 grid + CLS — tests / pool ablation
}

QUESTION_ENCODERS = ("lstm", "bert")
HEADS = ("ad", "mlp")  # attention-driven decoder [B:10] vs plain classifier


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    image_encoder: str = "resnet50"
    question_encoder: str = "lstm"
    hidden_dim: int = 512  # shared fusion width
    num_heads: int = 8
    btia_layers: int = 2
    head: str = "mlp"
    answer_vocab_size: int = 512
    # LSTM path
    question_vocab_size: int = 8192
    word_embed_dim: int = 300
    lstm_hidden: int = 512
    lstm_bidirectional: bool = True
    # BERT path
    bert_layers: int = 12
    bert_hidden: int = 768
    bert_heads: int = 12
    bert_vocab_size: int = 30522
    # shared
    max_question_len: int = 32
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    num_answer_queries: int = 0  # 0 → one query per answer (AD head)
    # Pool the image patch grid to (g, g) tokens before fusion (0 = off).
    # TPU-first throughput lever for the many-questions-per-image fan-out
    # [B:11]: fused tokens replicate per question, so 577 ViT-L tokens
    # through 4 BTIA layers dominate the per-pair cost; pooling to 7x7+CLS
    # cuts fusion FLOPs ~7x at negligible accuracy cost.
    image_pool_grid: int = 0
    mixed_precision: bool = True
    remat: bool = False  # rematerialize encoder/fusion blocks in backward
    # Serve FFN matmuls via the fused-epilogue int8 Pallas kernel
    # (ops/quant.py): dynamic per-token activation quant in VMEM,
    # int8×int8→int32 MXU dot at 2× the bf16 rate. Inference-only —
    # training/backward and the fp32 parity path keep plain matmuls.
    int8_ffn: bool = False

    @property
    def image_dim(self) -> int:
        return IMAGE_ENCODERS[self.image_encoder][0]

    @property
    def image_size(self) -> int:
        return IMAGE_ENCODERS[self.image_encoder][1]

    @property
    def num_image_tokens(self) -> int:
        return IMAGE_ENCODERS[self.image_encoder][2]

    def validate(self) -> None:
        if self.image_encoder not in IMAGE_ENCODERS:
            raise ValueError(f"unknown image encoder {self.image_encoder}")
        if self.question_encoder not in QUESTION_ENCODERS:
            raise ValueError(f"unknown question encoder {self.question_encoder}")
        if self.head not in HEADS:
            raise ValueError(f"unknown head {self.head}")
        if self.hidden_dim % self.num_heads:
            raise ValueError("hidden_dim must divide num_heads")


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "vqa_rad"  # vqa_rad | slake | pathvqa | vqa_med | synthetic
    data_dir: str = ""
    answer_top_k: int = 0  # 0 = keep all train answers
    closed_only: bool = False  # VQA-RAD closed-ended subset [B:7]
    language: str = "en"  # SLAKE filter [B:8]
    num_workers: int = 2
    # Host→device uint8 ship size; 0 = max(256, model.image_size). The
    # 256 floor keeps on-device resize headroom for real corpora (512px
    # DICOMs), but when the SOURCE images are already at encoder
    # resolution (synthetic studies), shipping 256px quadruples tunnel
    # bytes for zero fidelity — set ingest_size = image size there.
    ingest_size: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    eval_batch_size: int = 128
    epochs: int = 40
    lr: float = 2e-4
    encoder_lr_scale: float = 0.1  # lower LR on pretrained encoders
    weight_decay: float = 1e-4
    warmup_steps: int = 200
    grad_clip: float = 1.0
    label_smoothing: float = 0.0
    seed: int = 0
    log_every: int = 20
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    donate: bool = True
    debug_nans: bool = False  # jax_debug_nans for numerics triage [SURVEY §5.2]
    # Run this many optimizer steps per compiled program (lax.scan over a
    # stacked batch chunk). >1 keeps TrainState resident on device across
    # the chunk — one launch and one metrics fetch per K steps instead of
    # per step — which matters on dispatch-cost-heavy links (the axon
    # tunnel pays per output buffer; multi-host runs pay per dispatch).
    steps_per_call: int = 1


@dataclasses.dataclass(frozen=True)
class MeshCfg:
    data: int = -1
    model: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    name: str
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshCfg = MeshCfg()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        return Config(
            name=d["name"],
            model=ModelConfig(**d["model"]),
            data=DataConfig(**d["data"]),
            train=TrainConfig(**d["train"]),
            mesh=MeshCfg(**d["mesh"]),
        )

    def override(self, **kv) -> "Config":
        """Apply dotted overrides, e.g. override(**{"model.hidden_dim": 256})."""
        cfg = self
        for key, value in kv.items():
            parts = key.split(".")
            if len(parts) == 1:
                cfg = dataclasses.replace(cfg, **{key: value})
                continue
            section = getattr(cfg, parts[0])
            field_types = {f.name: f.type for f in dataclasses.fields(section)}
            if parts[1] not in field_types:
                raise KeyError(f"no config field {key}")
            current = getattr(section, parts[1])
            if isinstance(current, bool) and isinstance(value, str):
                # bool('False') is True — coerce the text explicitly so
                # `--set model.remat=False` / `=no` disables rather than
                # silently enabling the flag.
                low = value.strip().lower()
                if low in ("true", "1", "yes", "on"):
                    value = True
                elif low in ("false", "0", "no", "off"):
                    value = False
                else:
                    raise ValueError(f"{key}: not a boolean: {value!r}")
            elif current is not None and not isinstance(value, type(current)):
                value = type(current)(value)
            section = dataclasses.replace(section, **{parts[1]: value})
            cfg = dataclasses.replace(cfg, **{parts[0]: section})
        return cfg


# ---------------------------------------------------------------------------
# Registry — one entry per reference config [B:6–11]
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Callable[[], Config]] = {}


def register_config(name: str):
    def wrap(fn: Callable[[], Config]):
        _REGISTRY[name] = fn
        return fn

    return wrap


def get_config(name: str, **overrides) -> Config:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; have {sorted(_REGISTRY)}")
    cfg = _REGISTRY[name]()
    cfg.model.validate()
    if overrides:
        cfg = cfg.override(**overrides)
    return cfg


def list_configs() -> Tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


@register_config("vqa_rad_lstm")
def _vqa_rad_lstm() -> Config:
    """VQA-RAD closed-ended: ResNet-50 + LSTM, small answer vocab [B:7]."""
    return Config(
        name="vqa_rad_lstm",
        model=ModelConfig(
            image_encoder="resnet50",
            question_encoder="lstm",
            hidden_dim=512,
            num_heads=8,
            btia_layers=2,
            head="mlp",
            answer_vocab_size=512,
        ),
        data=DataConfig(dataset="vqa_rad", closed_only=True),
        # Scanned multi-step training (equivalence-tested; measured 232x
        # step wall-time on dispatch-heavy links, benchmarks/train_bench.py)
        train=TrainConfig(steps_per_call=8),
    )


@register_config("slake_bert")
def _slake_bert() -> Config:
    """SLAKE English subset: BERT-base question encoder + BTIA fusion [B:8]."""
    return Config(
        name="slake_bert",
        model=ModelConfig(
            image_encoder="resnet50",
            question_encoder="bert",
            hidden_dim=768,
            num_heads=12,
            btia_layers=2,
            head="mlp",
            answer_vocab_size=512,
        ),
        data=DataConfig(dataset="slake", language="en"),
        train=TrainConfig(steps_per_call=8),
    )


@register_config("pathvqa_vit")
def _pathvqa_vit() -> Config:
    """PathVQA open-ended: ViT-B/16, large answer vocabulary head [B:9]."""
    return Config(
        name="pathvqa_vit",
        model=ModelConfig(
            image_encoder="vit_b16",
            question_encoder="bert",
            hidden_dim=768,
            num_heads=12,
            btia_layers=2,
            head="ad",
            answer_vocab_size=4096,
            num_answer_queries=256,  # factorized AD head for the large vocab
        ),
        data=DataConfig(dataset="pathvqa", answer_top_k=4096),
        train=TrainConfig(steps_per_call=8),
    )


@register_config("vqa_med_full")
def _vqa_med_full() -> Config:
    """VQA-Med (ImageCLEF 2019): full Enhanced BTIA-AD-Net [B:10]. Flagship."""
    return Config(
        name="vqa_med_full",
        model=ModelConfig(
            image_encoder="vit_b16",
            question_encoder="bert",
            hidden_dim=768,
            num_heads=12,
            btia_layers=4,
            head="ad",
            answer_vocab_size=2048,
        ),
        data=DataConfig(dataset="vqa_med"),
        train=TrainConfig(steps_per_call=8),
    )


@register_config("streaming_vitl")
def _streaming_vitl() -> Config:
    """Batched streaming inference: DICOM + ViT-L/336, many questions per
    image on a v5e pod slice [B:11]. TP over the 'model' mesh axis."""
    return Config(
        name="streaming_vitl",
        model=ModelConfig(
            image_encoder="vit_l336",
            question_encoder="bert",
            hidden_dim=768,
            num_heads=12,
            btia_layers=4,
            head="ad",
            answer_vocab_size=2048,
            num_answer_queries=64,  # factorized head; profiled sweet spot
            # 577 → 50 fused tokens per question. Measured accuracy cost:
            # zero on the synthetic-proxy ablation (3 seeds, pool on/off
            # identical at 0.375 val / 0.75 closed — benchmarks/
            # pool_accuracy.py, BENCH_NOTES r2); real-data check pending.
            image_pool_grid=7,
        ),
        data=DataConfig(dataset="vqa_rad"),
        mesh=MeshCfg(data=-1, model=2),
    )


@register_config("tiny_test")
def _tiny_test() -> Config:
    """Miniature config for unit tests / CI — not a reference config."""
    return Config(
        name="tiny_test",
        model=ModelConfig(
            image_encoder="resnet_tiny",
            question_encoder="lstm",
            hidden_dim=64,
            num_heads=4,
            btia_layers=1,
            head="mlp",
            answer_vocab_size=32,
            question_vocab_size=128,
            word_embed_dim=32,
            lstm_hidden=32,
            max_question_len=12,
            mixed_precision=False,
        ),
        data=DataConfig(dataset="synthetic"),
        train=TrainConfig(batch_size=8, eval_batch_size=8, epochs=2, warmup_steps=2),
    )
