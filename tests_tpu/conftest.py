"""On-device (real TPU) kernel tests — run explicitly, NEVER in the
default suite:

    python -m pytest tests_tpu/ -q      # needs the tunnel TPU, ~minutes

The CPU suite's interpret-mode oracles prove kernel MATH; this tier
proves the kernels COMPILE AND RUN on real hardware — the failure class
interpret mode cannot catch (e.g. the 16-head ViT-L bshd kernel's
21.07M scoped-VMEM overflow at the exact-fit q tile, found only on
device; BENCH_NOTES r3). Compilations persist in /tmp/btia_jax_cache,
so reruns are fast. The TPU tunnel is single-tenant: do not run this
while any other TPU process (bench, serve) is live.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    # Probe backend init with a deadline: a wedged axon tunnel hangs
    # jax.default_backend() indefinitely (observed >5 h, CLAUDE.md) —
    # that must read as SKIP, not a hung test session.
    import threading

    found = []

    def _probe():
        import jax

        found.append(jax.default_backend())

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(120)
    if found and found[0] in ("tpu", "axon"):
        return
    reason = (
        "no TPU device visible"
        if found
        else "TPU backend init did not complete in 120s (tunnel wedged)"
    )
    skip = pytest.mark.skip(reason=reason)
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
