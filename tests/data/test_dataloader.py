"""DPDataLoader unit tests: per-rank sharding (split_dataset_by_node analog),
batching, background workers, and checkpointable position."""

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.data import DPDataLoader


class ListDS:
    def __init__(self, n):
        self.items = list(range(n))

    def __iter__(self):
        return iter(self.items)


class TestDPDataLoader:
    def test_rank_split_disjoint_and_complete(self):
        loaders = [
            DPDataLoader(rank=r, dataset=ListDS(12), batch_size=1,
                         collate_fn=lambda b: b[0], num_replicas=3)
            for r in range(3)
        ]
        shards = [list(l) for l in loaders]
        assert shards[0] == [0, 3, 6, 9]
        assert shards[1] == [1, 4, 7, 10]
        assert sorted(sum(shards, [])) == list(range(12))

    def test_batching_drops_trailing_partial(self):
        loader = DPDataLoader(rank=0, dataset=ListDS(7), batch_size=3)
        batches = list(loader)
        assert batches == [[0, 1, 2], [3, 4, 5]]

    def test_background_workers_preserve_order(self):
        loader = DPDataLoader(rank=0, dataset=ListDS(20), batch_size=2, num_workers=2)
        assert list(loader) == [[i, i + 1] for i in range(0, 20, 2)]

    def test_state_dict_resume_skip_for_stateless_dataset(self):
        loader = DPDataLoader(rank=0, dataset=ListDS(10), batch_size=2,
                              collate_fn=lambda b: b)
        it = iter(loader)
        next(it), next(it)
        state = loader.state_dict()
        assert state["dp_rank_0"]["batches_yielded"] == 2

        fresh = DPDataLoader(rank=0, dataset=ListDS(10), batch_size=2,
                             collate_fn=lambda b: b)
        fresh.load_state_dict(state)
        assert next(iter(fresh)) == [4, 5]  # skips the 2 consumed batches
