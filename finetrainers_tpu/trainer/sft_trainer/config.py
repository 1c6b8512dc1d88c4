"""SFT trainer arg groups. Parity with reference `trainer/sft_trainer/config.py:11,53`."""

from __future__ import annotations

import argparse
from typing import List, Optional

from ...utils.args_config import ArgsConfigMixin


class SFTLowRankConfig(ArgsConfigMixin):
    """LoRA training args (rank=64, lora_alpha=64, regex target_modules)."""

    def __init__(self) -> None:
        self.rank: int = 64
        self.lora_alpha: int = 64
        self.target_modules: str = "(transformer_blocks|blocks).*(to_q|to_k|to_v|to_out)"

    def add_args(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--rank", type=int, default=64)
        parser.add_argument("--lora_alpha", type=int, default=64)
        parser.add_argument(
            "--target_modules", type=str, nargs="+",
            default=["(transformer_blocks|blocks).*(to_q|to_k|to_v|to_out)"],
        )

    def map_args(self, argparse_args, mapped_args) -> None:
        mapped_args.rank = argparse_args.rank
        mapped_args.lora_alpha = argparse_args.lora_alpha
        tm = argparse_args.target_modules
        mapped_args.target_modules = tm if isinstance(tm, str) else "|".join(tm)

    def validate_args(self, args) -> None:
        if args.rank < 1:
            raise ValueError("LoRA rank must be >= 1")


class SFTFullRankConfig(ArgsConfigMixin):
    """Full-finetune: no extra args."""

    def add_args(self, parser: argparse.ArgumentParser) -> None:
        pass

    def map_args(self, argparse_args, mapped_args) -> None:
        pass

    def validate_args(self, args) -> None:
        pass
