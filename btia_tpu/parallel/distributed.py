"""Multi-host process-group initialization [SURVEY §2.5, §5.8].

On a multi-host v5e pod slice each host runs this process; XLA collectives
ride ICI within the slice and DCN across slices once
``jax.distributed.initialize`` has run. Single-host (and this sandbox's
single tunneled chip) skips initialization cleanly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX process group when multi-host env is present.

    Resolution order: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env → TPU metadata autodetection
    (arg-less initialize) when JAX_USE_DISTRIBUTED=1. Returns True if the
    process group is (already) up.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address and num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )
        _INITIALIZED = True
    elif os.environ.get("JAX_USE_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # TPU metadata autodetect
        _INITIALIZED = True
    return _INITIALIZED


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0
