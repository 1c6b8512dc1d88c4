"""finetrainers_tpu: a TPU-native (JAX/XLA/pjit/Pallas) fine-tuning framework for
diffusion transformers, with the capabilities of a-r-r-o-w/finetrainers.

See SURVEY.md for the capability contract and reference file:line citations.
"""

from .args import BaseArgs
from .config import ModelType, TrainingType
from .logging import get_logger
from .models import ModelSpecification
from .trainer import ControlTrainer, SFTTrainer


__version__ = "0.2.0"
