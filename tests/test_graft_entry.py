"""Driver entry-point regression tests [VERDICT r3 #1].

Round 3's MULTICHIP artifact failed (rc=124) because dryrun_multichip
queried the default backend (jax.devices()) before forcing the CPU
platform — on a wedged axon tunnel that call blocks forever. These tests
pin the invariant: dryrun_multichip must NEVER touch the default backend.

Dead-tunnel simulation: with PALLAS_AXON_POOL_IPS unset, the sandbox
sitecustomize skips axon registration, while JAX_PLATFORMS=axon in the
env makes any default-backend query raise "Backend 'axon' is not in the
list of known backends" immediately. A hang-class regression (touching
the default backend first) thus becomes a loud, fast failure here.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_multichip_survives_dead_tunnel():
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # Poisoned default platform: any pre-force backend query dies loudly.
    env["JAX_PLATFORMS"] = "axon"
    # Simulate the driver env (no forced host device count preset): the
    # entry point must set xla_force_host_platform_device_count itself.
    env["XLA_FLAGS"] = ""
    r = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "dryrun", "8"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (
        f"dryrun_multichip failed under dead-tunnel env\n"
        f"stdout: {r.stdout[-2000:]}\nstderr: {r.stderr[-2000:]}"
    )
    assert "dryrun_multichip OK" in r.stdout


def test_dryrun_multichip_source_never_queries_default_backend():
    """Static guard: no jax.devices()/jax.default_backend() call may
    precede the jax.config.update('jax_platforms','cpu') force inside
    dryrun_multichip (cheap tripwire alongside the subprocess test)."""
    src = (REPO / "__graft_entry__.py").read_text()
    body = src.split("def dryrun_multichip", 1)[1]
    force_at = body.index('jax.config.update("jax_platforms", "cpu")')
    # Strip comments and string literals (the docstring legitimately
    # names jax.devices()); only executable code counts.
    code_lines = []
    in_doc = False
    for ln in body[:force_at].splitlines():
        s = ln.strip()
        if s.startswith('"""') or s.endswith('"""'):
            in_doc = not in_doc if s.count('"""') == 1 else in_doc
            continue
        if in_doc or s.startswith("#"):
            continue
        code_lines.append(ln.split("#")[0])
    pre = "\n".join(code_lines)
    assert "jax.devices()" not in pre
    assert "jax.default_backend()" not in pre
