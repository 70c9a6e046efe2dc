"""btia_tpu — TPU-native medical visual question answering framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``Abdallahkhale/Enhanced-BTIA-AD-Net-for-Medical-Visual-Question-Answering``
(see SURVEY.md; the reference mount was empty at survey time, so capability
claims are grounded in BASELINE.json — cited as [B:line] in docstrings).

Public API (the replication contract, [B:5]):

    from btia_tpu import predict, Predictor, build_model, get_config
"""

__version__ = "0.1.0"

from btia_tpu.configs import get_config, list_configs  # noqa: F401
from btia_tpu.models.model import BTIAADNet, build_model  # noqa: F401
from btia_tpu.infer.predict import Predictor, predict  # noqa: F401
