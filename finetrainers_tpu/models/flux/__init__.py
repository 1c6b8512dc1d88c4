from .base_specification import FLUX_TRANSFORMER_CONFIG, FluxModelSpecification
from .pipeline import FluxPipeline
from .transformer import (
    FluxTransformer2DModel,
    pack_flux_latents,
    prepare_latent_image_ids,
    unpack_flux_latents,
)
from .weights import export_flux_transformer_state_dict, flux_key_map, load_flux_transformer_params
