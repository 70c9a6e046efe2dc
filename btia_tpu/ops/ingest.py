"""On-device image preprocessing — resize + normalize fused into XLA.

The reference does PIL/torchvision resize + normalize on the host CPU
[SURVEY §2.2 "Image ingest", B:5 "resize, normalize" → "fused into XLA
on-device transforms"]. Here the host only DECODES bytes (JPEG/DICOM → uint8
or uint16 arrays, see btia_tpu/data/); the resize and normalize run on the
TPU inside the same jit program as the encoder, so:

  * host→device transfer ships small uint8 tensors (4× smaller than fp32);
  * resize/normalize fuse with the first conv/patchify matmul — no extra
    HBM round trip;
  * the single-core host [SURVEY §7.3] is not the bottleneck.

Bilinear resize is expressed as two dense matmuls (height and width
interpolation matrices, built at trace time) — this maps onto the MXU
instead of XLA's gather-based jax.image.resize, which lowers poorly on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics — the de-facto standard for pretrained ResNet/ViT
# encoders, which the reference's torchvision/timm encoders use.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.lru_cache(maxsize=32)
def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """Dense (dst, src) bilinear interpolation matrix, half-pixel centers.

    Matches torchvision's antialias=False bilinear convention so converted
    checkpoints see the same pixels [SURVEY §7.3 resize-parity hard part].
    """
    if src == dst:
        return np.eye(src, dtype=np.float32)
    out = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        w1 = x - x0
        x0c = min(max(x0, 0), src - 1)
        x1c = min(max(x0 + 1, 0), src - 1)
        out[i, x0c] += 1.0 - w1
        out[i, x1c] += w1
    return out


def resize_bilinear(images: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize (B, H, W, C) → (B, h, w, C) via two MXU matmuls."""
    B, H, W, C = images.shape
    h, w = out_hw
    x = images.astype(jnp.float32)
    mh = jnp.asarray(_resize_matrix(H, h))
    mw = jnp.asarray(_resize_matrix(W, w))
    # precision=HIGHEST: TPU matmuls default to bf16 passes, which costs
    # ~0.4% pixel error and breaks logit-level parity [SURVEY §7.3]; these
    # matrices are tiny so full-fp32 passes are free.
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum(
        "hH,bHwc->bhwc", mh, x, precision=hi, preferred_element_type=jnp.float32
    )
    x = jnp.einsum(
        "wW,bhWc->bhwc", mw, x, precision=hi, preferred_element_type=jnp.float32
    )
    return x


def normalize_images(
    images: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    scale: float = 1.0 / 255.0,
) -> jax.Array:
    """(x * scale - mean) / std, channelwise; fuses into adjacent matmuls."""
    mean = jnp.asarray(mean, dtype=jnp.float32)
    inv_std = 1.0 / jnp.asarray(std, dtype=jnp.float32)
    return (images.astype(jnp.float32) * scale - mean) * inv_std


def preprocess_images(
    images_u8: jax.Array,
    out_hw: Tuple[int, int],
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Full on-device ingest transform [B:5]: uint8 HWC → resized, normalized.

    Call INSIDE jit/pjit so XLA fuses it with the encoder's first layer.
    """
    x = resize_bilinear(images_u8, out_hw)
    x = normalize_images(x, mean, std)
    if out_dtype is not None:
        x = x.astype(out_dtype)
    return x
