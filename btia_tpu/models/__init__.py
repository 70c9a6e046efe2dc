from btia_tpu.models.model import BTIAADNet, build_model  # noqa: F401
