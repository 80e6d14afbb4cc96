from videonavqa_tpu.models.base import MODEL_REGISTRY, ModelConfig, get_model  # noqa: F401

# Import for registration side effects.
from videonavqa_tpu.models import (  # noqa: F401
    q_only_bow, q_only_lstm, v_only_cnn3d, v_only_cnn2d_lstm,
    concat2d, concat3d, film, time_multi_hop, mac,
)
