"""Native (C++) runtime components.

`build()` compiles the `_media_ops` CPython extension in-place on first use
(g++ via setuptools; no pybind11). Import via `get_media_ops()` which returns
the module or None — callers fall back to the numpy path.
"""

from __future__ import annotations

import importlib
import os
import pathlib
import subprocess
import sys
from typing import Optional

from ..logging import get_logger


logger = get_logger(__name__)

_NATIVE_DIR = pathlib.Path(__file__).parent
_cached = "unset"


def build(verbose: bool = False) -> bool:
    """Compile media_ops.cpp into this directory. Returns True on success."""
    import numpy as np
    import sysconfig

    src = _NATIVE_DIR / "media_ops.cpp"
    out = _NATIVE_DIR / "_media_ops.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return True
    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{include_py}", f"-I{include_np}",
        str(src), "-o", str(out),
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if result.returncode != 0:
            logger.warning(f"native build failed: {result.stderr[-500:]}")
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning(f"native build failed: {e}")
        return False


def get_media_ops() -> Optional[object]:
    """The compiled module, building it on first call; None if unavailable."""
    global _cached
    if _cached != "unset":
        return _cached
    _cached = None
    if os.environ.get("FINETRAINERS_DISABLE_NATIVE", "0") in ("1", "true"):
        return None
    if build():
        if str(_NATIVE_DIR) not in sys.path:
            sys.path.insert(0, str(_NATIVE_DIR))
        try:
            _cached = importlib.import_module("_media_ops")
        except ImportError as e:
            logger.warning(f"native import failed: {e}")
    return _cached
