from .base_specification import WAN_I2V_14B_CONFIG, WAN_T2V_1_3B_CONFIG, WanModelSpecification
from .pipeline import WanPipeline
from .transformer import WanTransformer3DModel
from .weights import export_wan_transformer_state_dict, load_wan_transformer_params, wan_key_map


# Control variant lives in control_specification (added with the control trainer).
try:
    from .control_specification import WanControlModelSpecification
except ImportError:
    WanControlModelSpecification = None
