from btia_tpu.infer.predict import Predictor, predict  # noqa: F401
from btia_tpu.infer.streaming import StreamingServer  # noqa: F401
