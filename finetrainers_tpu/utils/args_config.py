"""Pluggable argument-group contract. Parity with reference `utils/args_config.py:9-26`."""

from __future__ import annotations

import argparse
from typing import Any, Dict


class ArgsConfigMixin:
    """Interface for extending BaseArgs with trainer-specific argument groups."""

    def add_args(self, parser: argparse.ArgumentParser) -> None:
        raise NotImplementedError

    def map_args(self, argparse_args: argparse.Namespace, mapped_args: Any) -> None:
        raise NotImplementedError

    def validate_args(self, args: Any) -> None:
        raise NotImplementedError

    def to_dict(self) -> Dict[str, Any]:
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}
