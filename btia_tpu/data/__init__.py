from btia_tpu.data.vocab import AnswerVocab, WordVocab  # noqa: F401
from btia_tpu.data.datasets import VQASample, load_dataset  # noqa: F401
from btia_tpu.data.pipeline import Batch, make_iterator  # noqa: F401
