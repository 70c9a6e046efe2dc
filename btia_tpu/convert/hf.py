"""Pretrained-encoder weight maps: HF BERT/ViT and torchvision ResNet
→ btia_tpu Flax params [SURVEY §7.1 'encoders must support random init
now, pretrained-load later'].

No pretrained weights exist on this machine (zero egress), but the maps
are verified behaviourally in tests/test_hf_parity.py by converting
randomly-initialized HF `BertModel`/`ViTModel` instances and asserting
feature-level agreement with our encoders — so real `bert-base-uncased` /
`vit-base-patch16-224` checkpoints drop in unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def bert_params_from_hf(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """HF BertModel state_dict → BertQuestionEncoder params subtree."""
    out: Dict[str, Any] = {}
    for key, t in state_dict.items():
        v = _np(t)
        if key.startswith("pooler."):
            continue
        if key == "embeddings.word_embeddings.weight":
            _set(out, "word_embed/embedding", v)
        elif key == "embeddings.position_embeddings.weight":
            _set(out, "pos_embed/embedding", v)
        elif key == "embeddings.token_type_embeddings.weight":
            _set(out, "type_embed/embedding", v)
        elif key == "embeddings.LayerNorm.weight":
            _set(out, "ln_embed/scale", v)
        elif key == "embeddings.LayerNorm.bias":
            _set(out, "ln_embed/bias", v)
        else:
            m = re.match(r"encoder\.layer\.(\d+)\.(.*)", key)
            if not m:
                raise KeyError(f"unmapped HF BERT key {key!r}")
            i, rest = m.group(1), m.group(2)
            prefix = f"layer{i}"
            table = {
                "attention.self.query": "attn/q_proj",
                "attention.self.key": "attn/k_proj",
                "attention.self.value": "attn/v_proj",
                "attention.output.dense": "attn/o_proj",
                "intermediate.dense": "mlp/fc1",
                "output.dense": "mlp/fc2",
            }
            ln_table = {
                "attention.output.LayerNorm": "ln_attn",
                "output.LayerNorm": "ln_mlp",
            }
            mapped = False
            for hf, ours in table.items():
                if rest == f"{hf}.weight":
                    _set(out, f"{prefix}/{ours}/kernel", v.T)
                    mapped = True
                elif rest == f"{hf}.bias":
                    _set(out, f"{prefix}/{ours}/bias", v)
                    mapped = True
            for hf, ours in ln_table.items():
                if rest == f"{hf}.weight":
                    _set(out, f"{prefix}/{ours}/scale", v)
                    mapped = True
                elif rest == f"{hf}.bias":
                    _set(out, f"{prefix}/{ours}/bias", v)
                    mapped = True
            if not mapped:
                raise KeyError(f"unmapped HF BERT key {key!r}")
    return out


def vit_params_from_hf(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """HF ViTModel state_dict → btia_tpu ViT params subtree."""
    out: Dict[str, Any] = {}
    for key, t in state_dict.items():
        v = _np(t)
        if key == "embeddings.cls_token":
            _set(out, "cls_token", v)
        elif key == "embeddings.position_embeddings":
            _set(out, "pos_embed", v)
        elif key == "embeddings.patch_embeddings.projection.weight":
            # Conv (D, C, P, P) → Dense kernel (P*P*C, D) matching the
            # (ph, pw, c)-ordered patchify reshape in models/vit.py.
            D = v.shape[0]
            _set(out, "patch_embed/kernel", v.transpose(2, 3, 1, 0).reshape(-1, D))
        elif key == "embeddings.patch_embeddings.projection.bias":
            _set(out, "patch_embed/bias", v)
        elif key == "layernorm.weight":
            _set(out, "ln_final/scale", v)
        elif key == "layernorm.bias":
            _set(out, "ln_final/bias", v)
        else:
            m = re.match(r"encoder\.layer\.(\d+)\.(.*)", key)
            if not m:
                raise KeyError(f"unmapped HF ViT key {key!r}")
            i, rest = m.group(1), m.group(2)
            prefix = f"block{i}"
            table = {
                "attention.attention.query": "attn/q_proj",
                "attention.attention.key": "attn/k_proj",
                "attention.attention.value": "attn/v_proj",
                "attention.output.dense": "attn/o_proj",
                "intermediate.dense": "mlp/fc1",
                "output.dense": "mlp/fc2",
            }
            ln_table = {
                "layernorm_before": "ln1",
                "layernorm_after": "ln2",
            }
            mapped = False
            for hf, ours in table.items():
                if rest == f"{hf}.weight":
                    _set(out, f"{prefix}/{ours}/kernel", v.T)
                    mapped = True
                elif rest == f"{hf}.bias":
                    _set(out, f"{prefix}/{ours}/bias", v)
                    mapped = True
            for hf, ours in ln_table.items():
                if rest == f"{hf}.weight":
                    _set(out, f"{prefix}/{ours}/scale", v)
                    mapped = True
                elif rest == f"{hf}.bias":
                    _set(out, f"{prefix}/{ours}/bias", v)
                    mapped = True
            if not mapped:
                raise KeyError(f"unmapped HF ViT key {key!r}")
    return out


def resnet_params_from_torchvision(
    state_dict: Mapping[str, Any],
) -> Dict[str, Dict[str, Any]]:
    """torchvision resnet50 state_dict → (params, batch_stats) subtrees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(path, v):
        _set(params, f"{path}/kernel", _np(v).transpose(2, 3, 1, 0))

    def bn(path, key, v):
        v = _np(v)
        if key == "weight":
            _set(params, f"{path}/scale", v)
        elif key == "bias":
            _set(params, f"{path}/bias", v)
        elif key == "running_mean":
            _set(stats, f"{path}/mean", v)
        elif key == "running_var":
            _set(stats, f"{path}/var", v)

    for key, t in state_dict.items():
        if key.startswith("fc."):
            continue  # classifier head not used — feature extractor [B:7]
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("conv1."):
            conv("stem_conv", t)
        elif key.startswith("bn1."):
            bn("stem_bn", key.split(".", 1)[1], t)
        else:
            m = re.match(
                r"layer(\d+)\.(\d+)\.(conv\d|bn\d|downsample\.\d)\.(.*)", key
            )
            if not m:
                raise KeyError(f"unmapped torchvision key {key!r}")
            stage, block, mod, leaf = m.groups()
            base = f"stage{stage}_block{block}"
            if mod.startswith("conv"):
                conv(f"{base}/{mod}", t)
            elif mod.startswith("bn"):
                bn(f"{base}/{mod}", leaf, t)
            elif mod == "downsample.0":
                conv(f"{base}/downsample_conv", t)
            elif mod == "downsample.1":
                bn(f"{base}/downsample_bn", leaf, t)
    return {"params": params, "batch_stats": stats}


def merge_encoder_params(variables: Dict, subtree: Dict, scope: str) -> Dict:
    """Return variables with params[scope] (and batch_stats[scope]) replaced.

    Shapes are validated leaf-by-leaf against the existing template.
    """
    import jax

    def check(old, new, path=""):
        if isinstance(old, Mapping):
            missing = set(old) - set(new)
            extra = set(new) - set(old)
            if missing or extra:
                raise KeyError(
                    f"encoder subtree mismatch at {path or scope}: "
                    f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
                )
            return {k: check(old[k], new[k], f"{path}/{k}") for k in old}
        old_arr = np.asarray(old)
        if tuple(old_arr.shape) != tuple(np.shape(new)):
            raise ValueError(
                f"shape mismatch at {path}: {np.shape(new)} vs {old_arr.shape}"
            )
        return np.asarray(new, old_arr.dtype)

    out = {k: dict(v) for k, v in variables.items()}
    for coll in ("params", "batch_stats"):
        if coll in subtree and coll in out and scope in out[coll]:
            out[coll] = dict(out[coll])
            out[coll][scope] = check(out[coll][scope], subtree[coll])
        elif coll == "params" and coll not in subtree and scope in out.get(coll, {}):
            out[coll] = dict(out[coll])
            out[coll][scope] = check(out[coll][scope], subtree)
    return out
