"""PyTorch → JAX checkpoint conversion with logit-level parity
[B:5 "Checkpoint conversion from the reference PyTorch weights guarantees
logit-level parity on VQA-RAD/SLAKE"; SURVEY §3.4].

Structure-driven: we walk the FLAX parameter tree and derive each torch key
mechanically (so unexpected reference renames surface as explicit
missing-key errors, and the NAME_OVERRIDES table absorbs them without code
changes [SURVEY §7.3]).

Transforms:
    Dense   kernel (in, out)      ← torch Linear weight (out, in).T
    Conv    kernel (kh, kw, i, o) ← torch Conv2d weight (o, i, kh, kw)
    BatchNorm scale/bias          ← weight/bias;  batch_stats ← running_*
    LayerNorm scale/bias          ← weight/bias  (flax wrapper adds a
                                    wrapper stores scale/bias directly)
    Embed   embedding             ← Embedding weight
    everything else               ← same-named Parameter, same layout
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np

# torch-name overrides: flax path (joined with '/') → torch key.
# Empty until real reference checkpoints reveal their naming; data-driven
# by design so they drop in without code changes.
NAME_OVERRIDES: Dict[str, str] = {}


def _torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """flax param path → (torch key, transform kind)."""
    parts = [p for p in path if p != "LayerNorm_0"]
    leaf = parts[-1]
    base = ".".join(parts[:-1])
    joined = "/".join(path)
    if joined in NAME_OVERRIDES:
        # Overridden names still need the standard layout transform for
        # their leaf kind (Linear/Conv transposes) — only the NAME changes.
        return NAME_OVERRIDES[joined], "kernel" if leaf == "kernel" else "direct"

    if leaf == "kernel":
        return f"{base}.weight", "kernel"
    if leaf == "scale":
        return f"{base}.weight", "direct"
    if leaf == "bias":
        return f"{base}.bias", "direct"
    if leaf == "embedding":
        return f"{base}.weight", "direct"
    if leaf == "mean":
        return f"{base}.running_mean", "direct"
    if leaf == "var":
        return f"{base}.running_var", "direct"
    # raw Parameters (cls_token, pos_embed, hh_kernel, answer_queries, ...)
    return f"{base}.{leaf}" if base else leaf, "direct"


def _transform(kind: str, value: np.ndarray, target_shape) -> np.ndarray:
    if kind == "kernel":
        if value.ndim == 2:  # Linear (out, in) → (in, out)
            value = value.T
        elif value.ndim == 4:  # Conv (o, i, kh, kw) → (kh, kw, i, o)
            value = value.transpose(2, 3, 1, 0)
    if tuple(value.shape) != tuple(target_shape):
        raise ValueError(
            f"shape mismatch after transform: torch {value.shape} vs flax "
            f"{tuple(target_shape)}"
        )
    return value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    flax_variables: Mapping[str, Any],
) -> Dict[str, Any]:
    """Fill a {params, batch_stats} template from a torch state_dict."""
    sd = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in state_dict.items()
    }
    used = set()

    def fill(tree, prefix: Tuple[str, ...], collection: str):
        out = {}
        for name, sub in tree.items():
            path = prefix + (name,)
            if isinstance(sub, Mapping):
                out[name] = fill(sub, path, collection)
            else:
                key, kind = _torch_key(path)
                if key not in sd:
                    raise KeyError(
                        f"torch state_dict missing {key!r} "
                        f"(for flax {'/'.join(path)}); add a NAME_OVERRIDES "
                        f"entry if the reference names this differently"
                    )
                arr = _transform(kind, sd[key], np.shape(sub))
                used.add(key)
                out[name] = arr.astype(np.asarray(sub).dtype)
        return out

    result = {}
    for collection in flax_variables:
        result[collection] = fill(flax_variables[collection], (), collection)

    leftovers = {
        k for k in sd if k not in used and not k.endswith("num_batches_tracked")
    }
    if leftovers:
        raise ValueError(f"unconverted torch parameters: {sorted(leftovers)[:10]}")
    return result


def flax_params_from_torch(torch_model, flax_variables) -> Dict[str, Any]:
    return convert_state_dict(torch_model.state_dict(), flax_variables)


def verify_parity(
    torch_model,
    flax_model,
    flax_variables,
    images_u8: np.ndarray,
    question_ids: np.ndarray,
    atol: float = 2e-4,
) -> float:
    """Forward both models on identical probes; return max |Δlogit| and
    assert it is within tolerance [SURVEY §3.4: ~1e-4 fp32; measured <2e-4
    across all three model families, so 2e-4 is the default gate]. Run the
    flax side in fp32 (mixed_precision=False) — bf16 cannot meet
    logit-level tolerance."""
    import torch

    t_logits = (
        torch_model(
            torch.from_numpy(images_u8), torch.from_numpy(question_ids.astype(np.int64))
        )
        .detach()
        .numpy()
    )
    j_logits = np.asarray(
        jax.jit(
            lambda v, i, q: flax_model.apply(v, i, q, train=False)
        )(flax_variables, images_u8, question_ids.astype(np.int32))
    )
    err = float(np.abs(t_logits - j_logits).max())
    if err > atol:
        raise AssertionError(
            f"logit parity failure: max|Δ|={err:.2e} > atol={atol:.0e}"
        )
    return err
