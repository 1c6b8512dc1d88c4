"""Filesystem helpers. Parity with reference `utils/file.py`."""

from __future__ import annotations

import pathlib
import shutil
from typing import List, Union


def find_files(root: str, pattern: str, depth: int = 0) -> List[str]:
    root_path = pathlib.Path(root)
    result_files = []
    to_visit = [(root_path, 0)]
    while to_visit:
        path, current_depth = to_visit.pop()
        if not path.exists():
            continue
        for entry in path.iterdir():
            if entry.is_file() and entry.match(pattern):
                result_files.append(str(entry))
            elif entry.is_dir() and current_depth < depth:
                to_visit.append((entry, current_depth + 1))
    return result_files


def delete_files(dirs: Union[str, List[str], pathlib.Path, List[pathlib.Path]]) -> None:
    if not isinstance(dirs, list):
        dirs = [dirs]
    for d in dirs:
        d = pathlib.Path(d)
        if not d.exists():
            continue
        shutil.rmtree(d, ignore_errors=True)


def string_to_filename(s: str) -> str:
    return (
        s.replace(" ", "-")
        .replace("/", "-")
        .replace(":", "-")
        .replace(".", "-")
        .replace(",", "-")
        .replace(";", "-")
        .replace("!", "-")
        .replace("?", "-")
    )
