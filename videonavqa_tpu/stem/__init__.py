from videonavqa_tpu.stem.vgg import VGG_PARTIAL_CFG, init_vgg_partial, vgg_partial  # noqa: F401
from videonavqa_tpu.stem.obj_detector import (  # noqa: F401
    init_obj_detector, obj_detector, obj_detector_features, stem_features,
)
