from btia_tpu.core.dtypes import DTypePolicy, default_policy  # noqa: F401
