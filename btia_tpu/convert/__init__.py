from btia_tpu.convert.convert import (  # noqa: F401
    convert_state_dict,
    flax_params_from_torch,
    verify_parity,
)
