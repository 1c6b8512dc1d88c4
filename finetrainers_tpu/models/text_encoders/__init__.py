from .handles import (
    FlaxCLIPTextHandle,
    FlaxCLIPVisionHandle,
    FlaxGlmHandle,
    FlaxLlamaHandle,
)
from .towers import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    DecoderConfig,
    DecoderTextModel,
)


__all__ = [
    "CLIPTextConfig",
    "CLIPTextTower",
    "CLIPVisionConfig",
    "CLIPVisionTower",
    "DecoderConfig",
    "DecoderTextModel",
    "FlaxCLIPTextHandle",
    "FlaxCLIPVisionHandle",
    "FlaxGlmHandle",
    "FlaxLlamaHandle",
]
