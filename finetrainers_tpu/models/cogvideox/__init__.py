from .base_specification import COGVIDEOX_2B_CONFIG, COGVIDEOX_5B_CONFIG, CogVideoXModelSpecification
from .pipeline import CogVideoXPipeline
from .transformer import CogVideoXTransformer3DModel
from .weights import (
    cogvideox_key_map,
    export_cogvideox_transformer_state_dict,
    load_cogvideox_transformer_params,
)
