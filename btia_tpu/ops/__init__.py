from btia_tpu.ops.attention import (  # noqa: F401
    get_attention_impl,
    mha,
    mha_reference,
    set_attention_impl,
)
from btia_tpu.ops.bicross import bicross_attention, bicross_reference  # noqa: F401
from btia_tpu.ops.ingest import normalize_images, preprocess_images  # noqa: F401
