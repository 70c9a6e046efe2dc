from btia_tpu.train.steps import TrainState, create_state, make_eval_step, make_train_step  # noqa: F401
from btia_tpu.train.trainer import Trainer  # noqa: F401
