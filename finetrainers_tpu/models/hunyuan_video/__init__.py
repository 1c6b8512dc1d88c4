from .base_specification import HUNYUAN_VIDEO_CONFIG, HunyuanVideoModelSpecification
from .pipeline import HunyuanVideoPipeline
from .transformer import HunyuanVideoTransformer3DModel
from .weights import (
    export_hunyuan_transformer_state_dict,
    hunyuan_key_map,
    load_hunyuan_transformer_params,
)
