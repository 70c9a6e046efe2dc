"""Tracing/profiling hooks [SURVEY §5.1].

The reference has no profiling beyond prints; TPU-native observability:
  * trace(): jax.profiler context → TensorBoard/Perfetto traces
  * Timer: wall-clock spans with real-completion fetch (on the axon-
    tunneled chip, block_until_ready can return early — only a host fetch
    observes completion, see bench.py)
  * dump_hlo(): per-jit HLO dumps via XLA_FLAGS for kernel auditing
"""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str | Path = "/tmp/btia_trace") -> Iterator[None]:
    """Profile a region: `with trace('runs/x/trace'): step(...)`."""
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch(tree) -> None:
    """Force real completion of a computation (host fetch)."""
    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


class Timer:
    """Accumulating wall-clock timer for step loops."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def span(self, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            fetch(result)
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total / max(self.count, 1)


def dump_hlo(directory: str | Path) -> None:
    """Arrange XLA HLO dumps for every subsequent compile (set BEFORE the
    first jit of interest; takes effect for new compilations)."""
    d = str(Path(directory).absolute())
    Path(d).mkdir(parents=True, exist_ok=True)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_dump_to" not in flags:
        os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={d}".strip()


@contextlib.contextmanager
def check_tracer_leaks() -> Iterator[None]:
    """Leak/'sanitizer' analogue for JAX [SURVEY §5.2]: fail loudly if a
    traced value escapes its trace (the functional-code race condition)."""
    with jax.checking_leaks():
        yield


def memory_stats(device: Optional[jax.Device] = None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
