"""Control trainer arg groups. Parity with reference
`trainer/control_trainer/config.py:12-185` (ControlType, FrameConditioningType,
ControlLowRankConfig with rank/alpha patterns + qk-norm training + frame
conditioning args, ControlFullRankConfig)."""

from __future__ import annotations

import argparse
from enum import Enum
from typing import Optional

from ...utils.args_config import ArgsConfigMixin


class ControlType(str, Enum):
    CANNY = "canny"
    CUSTOM = "custom"
    NONE = "none"


class FrameConditioningType(str, Enum):
    INDEX = "index"
    PREFIX = "prefix"
    RANDOM = "random"
    FIRST_AND_LAST = "first_and_last"
    FULL = "full"


class _ControlArgsBase(ArgsConfigMixin):
    def __init__(self) -> None:
        self.control_type: str = ControlType.CANNY.value
        self.train_qk_norm: bool = False
        self.frame_conditioning_type: str = FrameConditioningType.FULL.value
        self.frame_conditioning_index: int = 0
        self.frame_conditioning_concatenate_mask: bool = False

    def _add_common(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--control_type", type=str, default=ControlType.CANNY.value,
                            choices=[c.value for c in ControlType])
        parser.add_argument("--train_qk_norm", action="store_true")
        parser.add_argument("--frame_conditioning_type", type=str,
                            default=FrameConditioningType.INDEX.value,
                            choices=[f.value for f in FrameConditioningType])
        parser.add_argument("--frame_conditioning_index", type=int, default=0)
        parser.add_argument("--frame_conditioning_concatenate_mask", action="store_true")

    def _map_common(self, ns, mapped) -> None:
        mapped.control_type = ns.control_type
        mapped.train_qk_norm = ns.train_qk_norm
        mapped.frame_conditioning_type = ns.frame_conditioning_type
        mapped.frame_conditioning_index = ns.frame_conditioning_index
        mapped.frame_conditioning_concatenate_mask = ns.frame_conditioning_concatenate_mask


class ControlLowRankConfig(_ControlArgsBase):
    """Control LoRA: the injection layer trains at full rank via rank_pattern."""

    def __init__(self) -> None:
        super().__init__()
        self.rank: int = 64
        self.lora_alpha: int = 64
        self.target_modules: str = "(transformer_blocks|blocks).*(to_q|to_k|to_v|to_out)"

    def add_args(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--rank", type=int, default=64)
        parser.add_argument("--lora_alpha", type=int, default=64)
        parser.add_argument("--target_modules", type=str, nargs="+",
                            default=["(transformer_blocks|blocks).*(to_q|to_k|to_v|to_out)"])
        self._add_common(parser)

    def map_args(self, ns, mapped) -> None:
        mapped.rank = ns.rank
        mapped.lora_alpha = ns.lora_alpha
        tm = ns.target_modules
        mapped.target_modules = tm if isinstance(tm, str) else "|".join(tm)
        self._map_common(ns, mapped)

    def validate_args(self, args) -> None:
        if args.rank < 1:
            raise ValueError("LoRA rank must be >= 1")


class ControlFullRankConfig(_ControlArgsBase):
    def add_args(self, parser: argparse.ArgumentParser) -> None:
        self._add_common(parser)

    def map_args(self, ns, mapped) -> None:
        self._map_common(ns, mapped)

    def validate_args(self, args) -> None:
        pass
