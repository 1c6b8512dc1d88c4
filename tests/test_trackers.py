"""Tracker tests (reference tests/test_trackers.py exercises WandbTracker init/
log/finish; here the offline JSONL tracker + sequential fan-out + timed() get
the same treatment, and wandb is covered when importable)."""

import json
import pathlib
import sys
import time

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.trackers import (
    BaseTracker,
    JSONLTracker,
    SequentialTracker,
    initialize_trackers,
)


class TestJSONLTracker:
    def test_log_and_artifacts(self, tmp_path):
        t = JSONLTracker("exp", str(tmp_path))
        t.log({"loss": 0.5, "lr": 1e-4, "skip_me": object()}, step=1)
        t.log_artifacts(
            [{"type": "video", "path": "v.mp4", "caption": "a clip"}], step=2
        )
        t.finish()
        lines = [json.loads(l) for l in (tmp_path / "exp.jsonl").read_text().splitlines()]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
        assert "skip_me" not in lines[0]  # non-scalars dropped
        assert lines[1]["validation/artifact_0"] == "v.mp4"
        assert lines[1]["validation/caption_0"] == "a clip"

    def test_timed_lands_in_next_log(self, tmp_path):
        t = JSONLTracker("exp", str(tmp_path))
        with t.timed("timing/step"):
            time.sleep(0.01)
        t.log({"loss": 1.0}, step=3)
        t.finish()
        line = json.loads((tmp_path / "exp.jsonl").read_text().splitlines()[0])
        assert line["timing/step"] >= 0.01

    def test_append_across_sessions(self, tmp_path):
        for step in (1, 2):
            t = JSONLTracker("exp", str(tmp_path))
            t.log({"loss": float(step)}, step=step)
            t.finish()
        assert len((tmp_path / "exp.jsonl").read_text().splitlines()) == 2


class TestSequentialTracker:
    def test_fans_out(self, tmp_path):
        a = JSONLTracker("a", str(tmp_path))
        b = JSONLTracker("b", str(tmp_path))
        seq = SequentialTracker([a, b])
        with seq.timed("timing/x"):
            pass
        seq.log({"loss": 2.0}, step=5)
        seq.finish()
        for name in ("a", "b"):
            line = json.loads((tmp_path / f"{name}.jsonl").read_text().splitlines()[0])
            assert line["loss"] == 2.0 and "timing/x" in line


class TestInitializeTrackers:
    def test_none_gives_dummy(self, tmp_path):
        t = initialize_trackers(["none"], experiment_name="e", config={}, log_dir=str(tmp_path))
        assert isinstance(t, BaseTracker) and not isinstance(t, JSONLTracker)
        t.log({"x": 1.0}, step=0)
        t.finish()

    def test_wandb_offline(self, tmp_path, monkeypatch):
        pytest.importorskip("wandb")
        monkeypatch.setenv("WANDB_MODE", "offline")
        t = initialize_trackers(["wandb"], experiment_name="e", config={"a": 1}, log_dir=str(tmp_path))
        t.log({"loss": 0.1}, step=0)
        t.finish()
        assert any(tmp_path.iterdir())
