"""Plumbing smoke for tools/floor_bench.py (the BASELINE.md memory-floor rows).

Runs the tiny configs end-to-end (real spec forward, fp8 frozen zeros, full
remat, AdamW) for both families, plus the FSDP-sharded static-memory mode —
catching spec-contract drift (latent layouts, forward signatures, sharding
helpers) without the full-size compile.
"""

import importlib
import json
import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def _run(monkeypatch, capsys, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_TIMED_STEPS", "1")
    import tools.floor_bench as fb

    importlib.reload(fb)  # re-read env-derived module constants (TINY, steps)
    fb.main()
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


@pytest.mark.parametrize("family", ["cogvideox_5b", "hunyuan_video"])
def test_tiny_train_step(monkeypatch, capsys, family):
    res = _run(monkeypatch, capsys, BENCH_FAMILY=family)
    assert res["value"] is not None and res["value"] > 0
    assert res["peak_hbm_gb_per_device"] is not None
    assert family in res["metric"]


def test_sharded_mem_only(monkeypatch, capsys):
    res = _run(
        monkeypatch, capsys,
        BENCH_FAMILY="hunyuan_video", BENCH_SHARDS="2", BENCH_MEM_ONLY="1",
    )
    assert res["dp_shards"] == 2
    assert res["metric"].endswith("_fsdp2")
    assert res["peak_hbm_gb_per_device"] is not None
    assert res["value"] is None  # mem-only: no timed steps
