"""Static checks over the shipped example recipes: JSON configs parse with the
expected schema and every train/inference script is valid bash referencing
flags the parsers actually accept."""

import json
import pathlib
import re
import subprocess
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

TRAINING_JSONS = sorted((REPO_ROOT / "examples/training").rglob("training.json"))
VALIDATION_JSONS = sorted((REPO_ROOT / "examples/training").rglob("validation.json"))
SCRIPTS = sorted((REPO_ROOT / "examples").rglob("*.sh")) + sorted(
    (REPO_ROOT / "tests/scripts").rglob("*.sh")
)


def test_recipes_exist():
    assert len(TRAINING_JSONS) >= 12
    assert len(SCRIPTS) >= 18


@pytest.mark.parametrize("path", TRAINING_JSONS, ids=lambda p: str(p.parent.relative_to(REPO_ROOT)))
def test_training_config_schema(path):
    cfg = json.loads(path.read_text())
    assert isinstance(cfg["datasets"], list) and cfg["datasets"]
    for ds in cfg["datasets"]:
        assert "data_root" in ds
        assert ds["dataset_type"] in ("image", "video")
        buckets = ds.get("video_resolution_buckets") or ds.get("image_resolution_buckets")
        assert buckets, "every recipe pins resolution buckets"
        dims = 3 if "video_resolution_buckets" in ds else 2
        assert all(len(b) == dims for b in buckets)


@pytest.mark.parametrize("path", VALIDATION_JSONS, ids=lambda p: str(p.parent.relative_to(REPO_ROOT)))
def test_validation_rows(path):
    rows = json.loads(path.read_text())["data"]
    assert rows
    for row in rows:
        assert row["caption"]
        assert row["height"] > 0 and row["width"] > 0


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: str(p.relative_to(REPO_ROOT)))
def test_script_is_valid_bash(path):
    subprocess.run(["bash", "-n", str(path)], check=True)


def test_train_script_flags_are_known():
    """Every --flag used by the training recipes must be accepted by the CLI
    parser stack (catches recipe/arg drift)."""
    import argparse

    from finetrainers_tpu import args as args_mod
    from finetrainers_tpu.args import AttentionProviderArgs
    from finetrainers_tpu.trainer.control_trainer import ControlLowRankConfig
    from finetrainers_tpu.trainer.sft_trainer import SFTLowRankConfig

    known = set()
    for trainer_cfg in (SFTLowRankConfig, ControlLowRankConfig):
        parser = argparse.ArgumentParser()
        args_mod._add_args(parser)
        AttentionProviderArgs().add_args(parser)
        trainer_cfg().add_args(parser)
        known |= {opt for action in parser._actions for opt in action.option_strings}
    for script in (REPO_ROOT / "examples/training").rglob("train.sh"):
        lines = [l for l in script.read_text().splitlines() if not l.lstrip().startswith("#")]
        used = set(re.findall(r"(--[a-z0-9_]+)", "\n".join(lines)))
        unknown = {u for u in used if u not in known}
        assert not unknown, f"{script}: unknown flags {sorted(unknown)}"
