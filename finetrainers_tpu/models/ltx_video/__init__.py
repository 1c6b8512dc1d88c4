from .base_specification import LTX_TRANSFORMER_CONFIG, LTXVideoModelSpecification
from .pipeline import LTXPipeline
from .transformer import LTXVideoTransformer3DModel, pack_latents, unpack_latents
from .weights import export_ltx_transformer_state_dict, load_ltx_transformer_params, ltx_key_map
