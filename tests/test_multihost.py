"""REAL multi-process training: 2 JAX processes form one 8-device CPU
'slice' and run the actual train step over a global DP4×TP2 mesh
[SURVEY §2.5, §5.8 — the jax.distributed communication backend].

This is the only tier that actually crosses a process boundary: the
coordinator rendezvous (parallel.distributed.maybe_initialize), the
global mesh whose 'data' axis spans both processes, the per-host local
batch feed (parallel.sharding.shard_batch multi-host road — no
cross-host batch transfer), and the gradient psum over the process
boundary. The virtual-8-device tests elsewhere validate sharding math;
this validates the distributed runtime itself.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

# Two subprocess JAX inits + compiles on the 1-core host — the single
# most expensive module in the suite [VERDICT r4 #7].
pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("multihost_serve")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             str(pid), "2", str(port), str(outdir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs, outdir


class TestMultiHost:
    def test_process_group_and_global_mesh(self, two_process_run):
        """Both processes see the 8-device global view through a real
        coordinator rendezvous."""
        for r in two_process_run[0]:
            assert r["nprocs"] == 2
            assert r["nglobal"] == 8
            assert r["nlocal"] == 4

    def test_replicated_metrics_agree_across_processes(self, two_process_run):
        """The psum'd loss and the post-step param checksum must be
        IDENTICAL on both processes — the replication contract of the
        cross-process gradient all-reduce."""
        a, b = two_process_run[0]
        assert a["loss"] == pytest.approx(b["loss"], abs=1e-6)
        assert a["checksum"] == pytest.approx(b["checksum"], rel=1e-6)

    def test_matches_single_process_step(self, two_process_run):
        """The 2-process step (local-shard feed + cross-host grad psum)
        equals the same step run single-process on 8 local devices —
        multi-host training changes the wiring, not the math."""
        from btia_tpu.configs import get_config
        from btia_tpu.models.model import build_model
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh
        from btia_tpu.parallel.sharding import shard_batch
        from btia_tpu.train.steps import create_state, make_train_step
        from tests.multihost_common import make_global_batch, param_checksum

        cfg = get_config("tiny_test")
        model = build_model(cfg.model)
        mesh = make_mesh(MeshConfig(data=4, model=2))
        state = create_state(model, cfg, mesh, steps_per_epoch=4)
        step = make_train_step(model, cfg, mesh)
        state, metrics = step(state, shard_batch(make_global_batch(cfg), mesh))
        ref_loss = float(np.asarray(metrics["loss"]))
        ref_sum = param_checksum(state.params)

        for r in two_process_run[0]:
            assert r["loss"] == pytest.approx(ref_loss, abs=2e-5), (
                r["loss"], ref_loss,
            )
            assert r["checksum"] == pytest.approx(ref_sum, rel=1e-5), (
                r["checksum"], ref_sum,
            )


class TestMultiHostServing:
    """The B:11 SERVING program across a real process boundary
    [VERDICT r4 #2]: make_sharded_serve_indexed_fn (unique question
    tower sharded over 'data', per-pair gather crossing shards, fused
    kernels under shard_map) on the 2-process DP4×TP2 mesh must equal
    the single-device plain serve."""

    def test_serving_logits_agree_across_processes(self, two_process_run):
        outs, outdir = two_process_run
        a = np.load(outdir / "serve_logits_p0.npy")
        b = np.load(outdir / "serve_logits_p1.npy")
        assert a.shape == (8, 4, 32)
        np.testing.assert_allclose(a, b, atol=1e-6)
        for r in outs:
            assert r["serve_checksum"] is not None

    def test_serving_matches_single_device(self, two_process_run):
        """Cross-process dedup serve == single-device PLAIN (per-pair,
        unfused-road) serve — one assertion spanning the process
        boundary, the dedup gather, the fused kernels, and the TP psum."""
        from btia_tpu.infer.sharded import make_sharded_serve_fn
        from btia_tpu.parallel.mesh import MeshConfig, make_mesh
        from tests.multihost_common import (
            init_serving_variables,
            make_serving_inputs,
            make_serving_model,
        )

        _, outdir = two_process_run
        model = make_serving_model()
        images, qids, _, _ = make_serving_inputs()
        variables = init_serving_variables(model, images, qids)
        import jax

        single = make_sharded_serve_fn(
            model, make_mesh(MeshConfig(1, 1), devices=jax.devices()[:1])
        )(variables, images, qids)

        for pid in range(2):
            got = np.load(outdir / f"serve_logits_p{pid}.npy")
            np.testing.assert_allclose(
                np.asarray(single), got, atol=3e-4
            )
