"""Precomputation unit tests (reference tests/data/test_precomputation.py:
in-memory vs precomputed consume/consume_once semantics, file layout)."""

import itertools
import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.constants import PRECOMPUTED_DIR_NAME
from finetrainers_tpu.data import initialize_preprocessor
from finetrainers_tpu.data.precomputation import PrecomputedDistributedDataPreprocessor


def _samples():
    i = 0
    while True:
        yield {"caption": f"c{i}", "value": np.full((2,), i, np.float32)}
        i += 1


PROCESSORS = {
    "condition": lambda caption=None, **kw: {"emb": np.array([len(caption)], np.float32)},
    "latent": lambda value=None, **kw: {"latents": value * 2},
}


class TestInMemory:
    def test_consume_drains_and_requires_data(self):
        pre = initialize_preprocessor(rank=0, num_items=3, processor_fn=PROCESSORS)
        data = iter(_samples())
        cond = pre.consume("condition", data, cache_samples=True)
        lat = pre.consume("latent", data, use_cached_samples=True, drop_samples=True)
        conds = list(cond)
        lats = list(lat)
        assert len(conds) == 3 and len(lats) == 3
        np.testing.assert_array_equal(lats[0]["latents"], [0.0, 0.0])
        assert pre.requires_data  # drained

    def test_consume_once_cycles(self):
        pre = initialize_preprocessor(rank=0, num_items=2, processor_fn=PROCESSORS)
        data = iter(_samples())
        lat = pre.consume_once("latent", data)
        out = list(itertools.islice(iter(lat), 5))
        assert len(out) == 5  # cycles past the buffer size
        # Cycles ALL buffered items in order, not just the first (regression:
        # a drained once-buffer used to re-trigger refills that replaced the
        # set and silently trained on item 0 of every refill).
        np.testing.assert_array_equal(out[0]["latents"], [0.0, 0.0])
        np.testing.assert_array_equal(out[1]["latents"], [2.0, 2.0])
        np.testing.assert_array_equal(out[2]["latents"], [0.0, 0.0])
        assert not pre.requires_data  # once-iterables never require a refill

    def test_consume_requires_data_only_at_last_item(self):
        pre = initialize_preprocessor(rank=0, num_items=3, processor_fn=PROCESSORS)
        it = iter(pre.consume("latent", iter(_samples())))
        next(it)
        assert not pre.requires_data
        next(it)
        assert not pre.requires_data
        next(it)
        assert pre.requires_data  # last item handed out -> refill needed


class TestPrecomputed:
    def test_file_layout(self, tmp_path):
        pre = initialize_preprocessor(
            rank=0, num_items=2, processor_fn=PROCESSORS,
            save_dir=str(tmp_path), enable_precomputation=True,
        )
        data = iter(_samples())
        it = pre.consume("condition", data)
        files = sorted((tmp_path / PRECOMPUTED_DIR_NAME).iterdir())
        assert [f.name for f in files] == ["condition-0.npz", "condition-1.npz"]
        out = list(it)
        assert len(out) == 2

    def test_rank_offset_naming(self, tmp_path):
        pre = initialize_preprocessor(
            rank=1, num_items=2, processor_fn=PROCESSORS,
            save_dir=str(tmp_path), enable_precomputation=True,
        )
        pre.consume("latent", iter(_samples()))
        files = sorted((tmp_path / PRECOMPUTED_DIR_NAME).iterdir())
        assert [f.name for f in files] == ["latent-2.npz", "latent-3.npz"]

    def test_reuse_mode_validates(self, tmp_path):
        pre = initialize_preprocessor(
            rank=0, num_items=2, processor_fn=PROCESSORS,
            save_dir=str(tmp_path), enable_precomputation=True,
        )
        pre.consume("latent", iter(_samples()))
        reuse = PrecomputedDistributedDataPreprocessor.load_existing(
            rank=0, num_items=2, save_dir=str(tmp_path), data_type="latent")
        out = list(itertools.islice(iter(reuse), 3))
        assert len(out) == 3

    def test_reuse_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            PrecomputedDistributedDataPreprocessor.load_existing(
                rank=0, num_items=2, save_dir=str(tmp_path), data_type="latent")
