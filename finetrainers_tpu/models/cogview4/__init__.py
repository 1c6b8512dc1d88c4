from .base_specification import COGVIEW4_TRANSFORMER_CONFIG, CogView4ModelSpecification
from .pipeline import CogView4Pipeline
from .transformer import CogView4Transformer2DModel
from .weights import (
    cogview4_key_map,
    export_cogview4_transformer_state_dict,
    load_cogview4_transformer_params,
)


try:
    from .control_specification import CogView4ControlModelSpecification
except ImportError:
    CogView4ControlModelSpecification = None
