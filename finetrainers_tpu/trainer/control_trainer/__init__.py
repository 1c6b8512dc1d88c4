from .config import ControlFullRankConfig, ControlLowRankConfig, ControlType, FrameConditioningType
from .data import IterableControlDataset, apply_frame_conditioning_on_latents
from .trainer import ControlTrainer
