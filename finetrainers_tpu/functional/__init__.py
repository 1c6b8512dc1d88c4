from .diffusion import (
    compute_density_for_timestep_sampling,
    compute_loss_weighting,
    default_flow_shift,
    flow_match_target,
    flow_match_xt,
    resolution_dependent_timestep_flow_shift,
)
from .image import (
    bicubic_resize_image,
    center_crop_image,
    find_nearest_resolution_image,
    resize_crop_image,
    resize_to_nearest_bucket_image,
)
from .normalization import normalize
from .text import convert_byte_str_to_str, dropout_caption, dropout_embeddings_to_zero, remove_prefix
from .video import (
    bicubic_resize_video,
    center_crop_video,
    find_nearest_video_bucket,
    resize_crop_video,
    resize_to_nearest_bucket_video,
)


__all__ = [
    "compute_density_for_timestep_sampling",
    "compute_loss_weighting",
    "default_flow_shift",
    "flow_match_target",
    "flow_match_xt",
    "resolution_dependent_timestep_flow_shift",
    "bicubic_resize_image",
    "center_crop_image",
    "find_nearest_resolution_image",
    "resize_crop_image",
    "resize_to_nearest_bucket_image",
    "normalize",
    "convert_byte_str_to_str",
    "dropout_caption",
    "dropout_embeddings_to_zero",
    "remove_prefix",
    "bicubic_resize_video",
    "center_crop_video",
    "find_nearest_video_bucket",
    "resize_crop_video",
    "resize_to_nearest_bucket_video",
]
