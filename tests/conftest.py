"""Test env: virtual 8-device CPU mesh [SURVEY §4.2 'Distributed' tier].

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The sandbox's sitecustomize force-registers the 'axon' TPU platform and
# overrides jax_platforms at interpreter start; env vars alone don't win.
# Re-point jax at CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    from btia_tpu.configs import get_config

    return get_config("tiny_test")


@pytest.fixture(scope="session")
def tiny_model_and_vars(tiny_cfg):
    import jax
    import jax.numpy as jnp
    from btia_tpu.models.model import build_model

    model = build_model(tiny_cfg.model)
    key = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, 96, 96, 3), jnp.uint8)
    qids = jnp.zeros((2, tiny_cfg.model.max_question_len), jnp.int32)
    variables = model.init({"params": key, "dropout": key}, imgs, qids)
    return model, variables


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    return tmp_path_factory.mktemp("synth")
