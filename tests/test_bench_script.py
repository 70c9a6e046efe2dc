"""bench.py is the driver-judged artifact — smoke it end-to-end (tiny
config, CPU) and validate the one-line JSON contract."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


class TestBenchScript:
    def test_json_contract(self):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU (see conftest)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [
                sys.executable,
                str(REPO / "bench.py"),
                "--config",
                "tiny_test",
                "--batch",
                "2",
                "--questions",
                "2",
                "--steps",
                "2",
                "--warmup",
                "0",
                "--json-only",
            ],
            capture_output=True,
            text=True,
            timeout=480,
            cwd=REPO,
            # env was built above but historically NOT passed — the child
            # inherited PALLAS_AXON_POOL_IPS and silently ran this "CPU
            # smoke test" on the TPU tunnel (single-tenant!), hanging in
            # backend-init retries whenever the tunnel was unhealthy.
            env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = out.stdout.strip().splitlines()[-1]
        result = json.loads(line)
        assert result["metric"] == "image_question_pairs_per_sec_per_chip"
        assert result["unit"] == "pairs/s/chip"
        assert result["value"] > 0
        assert result["vs_baseline"] == round(result["value"] / 5000.0, 3)
