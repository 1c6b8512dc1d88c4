from .base import ProcessorMixin
from .control import CannyProcessor, CopyProcessor
from .text import CaptionEmbeddingDropoutProcessor, CaptionTextDropoutProcessor
from .text_encoders import (
    CLIPPooledProcessor,
    CogView4GLMProcessor,
    FlaxT5Handle,
    HashEncoder,
    LlamaProcessor,
    T5Processor,
)
