"""Subprocess body for tests/test_multihost.py — ONE JAX process of a
2-process CPU 'slice' (4 local virtual devices each, 8 global).

Exercises the REAL multi-host product path end-to-end [SURVEY §2.5,
§5.8]: parallel.distributed.maybe_initialize (coordinator rendezvous),
a global ('data','model') mesh spanning both processes,
parallel.sharding.shard_batch feeding this process's LOCAL batch shard
(no cross-host batch transfer), and one train/steps.make_train_step
step whose gradient psum crosses the process boundary. Prints one JSON
line {pid, nprocs, nglobal, loss, checksum} for the parent to compare
against a single-process 8-device run of the identical step.

After the train step it runs the SHARDED DEDUP SERVING program
(infer/sharded.make_sharded_serve_indexed_fn — unique question tower
sharded over 'data', per-pair gather crossing shards, fused kernels
under shard_map via interpret mode) over the same global mesh and saves
the full logits to <outdir>/serve_logits_p<pid>.npy for the parent to
compare against the single-device reference [VERDICT r4 #2: B:11 is a
serving claim].

Usage: multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import json
import os
import sys
from pathlib import Path

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
outdir = Path(sys.argv[4]) if len(sys.argv) > 4 else None
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU (CLAUDE.md trap)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from btia_tpu.parallel.distributed import maybe_initialize, process_count

assert maybe_initialize(f"127.0.0.1:{port}", nproc, pid)
assert process_count() == nproc, process_count()

import numpy as np

from btia_tpu.configs import get_config
from btia_tpu.models.model import build_model
from btia_tpu.parallel.mesh import MeshConfig, make_mesh
from btia_tpu.parallel.sharding import shard_batch
from btia_tpu.train.steps import create_state, make_train_step
from tests.multihost_common import make_global_batch, param_checksum

cfg = get_config("tiny_test")
model = build_model(cfg.model)
# DP4 x TP2: the model axis stays intra-process (contiguous device
# order), the data axis crosses the process boundary — so the gradient
# psum is the cross-host collective, exactly the pod-slice layout.
mesh = make_mesh(MeshConfig(data=4, model=2))
state = create_state(model, cfg, mesh, steps_per_epoch=4)
step = make_train_step(model, cfg, mesh)

batch = make_global_batch(cfg)
B = batch["answer_ids"].shape[0]
lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)
local = {k: v[lo:hi] for k, v in batch.items()}
state, metrics = step(state, shard_batch(local, mesh))

loss = float(np.asarray(metrics["loss"]))

# --- the SERVING program across the real process boundary [VERDICT r4 #2]
serve_checksum = None
if outdir is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from btia_tpu.infer.sharded import (
        make_sharded_serve_indexed_fn,
        shard_serving_params,
    )
    from tests.multihost_common import (
        force_fused_interpret,
        init_serving_variables,
        make_serving_inputs,
        make_serving_model,
    )

    force_fused_interpret()
    smodel = make_serving_model()
    images, qids, uniq, qmap = make_serving_inputs()
    variables = init_serving_variables(smodel, images, qids)
    svars = shard_serving_params(variables, mesh)

    # Per-host LOCAL feed (the product road): each process supplies only
    # the rows its own devices hold; unique-row gathers then cross the
    # process boundary inside the program.
    nrows = images.shape[0] // nproc
    urows = uniq.shape[0] // nproc
    feed = shard_batch(
        {
            "images": images[pid * nrows : (pid + 1) * nrows],
            "uniq": uniq[pid * urows : (pid + 1) * urows],
            "qmap": qmap[pid * nrows : (pid + 1) * nrows],
        },
        mesh,
    )
    logits = make_sharded_serve_indexed_fn(smodel, mesh)(
        svars, feed["images"], feed["uniq"], feed["qmap"]
    )
    # Replicate so every process can fetch the FULL logits.
    rep = jax.jit(lambda y: y, out_shardings=NamedSharding(mesh, P()))(logits)
    full = np.asarray(rep)
    np.save(outdir / f"serve_logits_p{pid}.npy", full)
    serve_checksum = float(np.abs(full).sum())

print(
    json.dumps(
        {
            "pid": pid,
            "nprocs": process_count(),
            "nglobal": len(jax.devices()),
            "nlocal": len(jax.local_devices()),
            "loss": loss,
            "checksum": param_checksum(state.params),
            "serve_checksum": serve_checksum,
        }
    ),
    flush=True,
)
