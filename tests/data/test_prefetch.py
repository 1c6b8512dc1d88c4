"""DevicePrefetcher unit tests: ordering, snapshot consistency, error
propagation, stop()."""

import pathlib
import sys
import time

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.data import DevicePrefetcher


class TestDevicePrefetcher:
    def test_order_and_exhaustion(self):
        pf = DevicePrefetcher(iter(range(5)), depth=2)
        assert list(pf) == [0, 1, 2, 3, 4]
        with pytest.raises(StopIteration):
            next(pf)

    def test_snapshot_tracks_consumed_not_produced(self):
        produced = {"n": 0}

        def source():
            for i in range(10):
                produced["n"] = i + 1
                yield i

        pf = DevicePrefetcher(source(), depth=3, snapshot_fn=lambda: produced["n"])
        got = next(pf)
        assert got == 0
        # The snapshot travels with the batch: state as of *this* batch, even
        # though the producer has run ahead by up to `depth`.
        assert pf.consumed_state == 1
        next(pf)
        assert pf.consumed_state == 2

    def test_error_propagates(self):
        def source():
            yield 1
            raise RuntimeError("decode failed")

        pf = DevicePrefetcher(source(), depth=2)
        assert next(pf) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            while True:
                next(pf)

    def test_stop_unblocks_producer(self):
        def source():
            i = 0
            while True:
                yield i
                i += 1

        pf = DevicePrefetcher(source(), depth=1)
        assert next(pf) == 0
        pf.stop()
        deadline = time.time() + 5
        while pf._thread.is_alive() and time.time() < deadline:
            time.sleep(0.01)
        assert not pf._thread.is_alive()
