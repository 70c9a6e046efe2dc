from btia_tpu.configs.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    get_config,
    list_configs,
    register_config,
)
