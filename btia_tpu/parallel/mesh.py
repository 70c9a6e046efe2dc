"""Device mesh construction — the spine of all parallelism.

The reference is single-process / single-GPU and has no distributed backend
[SURVEY §2.5]. The TPU-native communication backend is XLA collectives over
ICI/DCN, emitted automatically by jit from NamedSharding annotations over a
``jax.sharding.Mesh`` — this module owns that mesh.

Axes:
  ``data``  — batch (DP); gradient psum rides ICI.
  ``model`` — tensor parallelism (TP) for the ViT-L/336 serving config
              [B:11]: attention heads + MLP hidden sharded over this axis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Declarative mesh shape. -1 means "all remaining devices"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        data, model = self.data, self.model
        if model == -1 and data == -1:
            raise ValueError("at most one mesh axis may be -1")
        if data == -1:
            data = n_devices // model
        if model == -1:
            model = n_devices // data
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices; "
                f"pick divisors of the device count"
            )
        return data, model


def make_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices.

    Device order follows ``jax.devices()`` which on TPU respects physical
    ICI topology, so the contiguous ``model`` axis (the chatty one — TP
    all-reduces every layer) lands on nearest-neighbour ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])


def best_mesh_config(n_devices: int, max_model: int = 1) -> MeshConfig:
    """Largest model axis dividing n_devices, capped at max_model."""
    model = math.gcd(n_devices, max_model)
    while n_devices % model:
        model -= 1
    return MeshConfig(data=n_devices // model, model=model)
