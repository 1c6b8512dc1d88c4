"""TrainState round-trip + rank-aware/frequency-limited logging tests
(reference state.py:16-66 and logging.py:15-139 behaviors)."""

import logging
import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.logging import get_logger
from finetrainers_tpu.state import State, TrainState


class TestTrainState:
    def test_round_trip(self):
        ts = TrainState(step=7, observed_data_samples=56)
        ts.global_avg_losses.extend([1.0, 0.5])
        ts.log_steps.append(7)
        restored = TrainState()
        restored.load_state_dict(ts.state_dict())
        assert restored.step == 7
        assert restored.observed_data_samples == 56
        assert restored.global_avg_losses == [1.0, 0.5]
        assert restored.log_steps == [7]

    def test_unknown_keys_ignored(self):
        ts = TrainState()
        ts.load_state_dict({"step": 3, "from_a_newer_version": 1})
        assert ts.step == 3

    def test_state_container(self):
        s = State(output_dir="/tmp/x", num_trainable_parameters=10)
        assert s.train_state.step == 0
        assert s.output_dir == "/tmp/x"


class _ListHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


class TestLogger:
    def _capture(self, fn):
        # The package logger sets propagate=False, so attach a handler directly.
        logger = get_logger("finetrainers_tpu.testcase")
        logger.logger.setLevel(logging.INFO)
        handler = _ListHandler()
        logger.logger.addHandler(handler)
        try:
            fn(logger)
        finally:
            logger.logger.removeHandler(handler)
        return handler.messages

    def test_frequency_limiting(self):
        def fn(logger):
            for i in range(10):
                logger.info(f"tick {i}", frequency=5, frequency_key="tick")

        assert self._capture(fn) == ["tick 0", "tick 5"]

    def test_main_process_logs_on_rank0(self):
        msgs = self._capture(lambda lg: lg.info("hello", main_process_only=True))
        assert msgs == ["hello"]  # single-controller process 0

    def test_in_order_tags_process(self):
        msgs = self._capture(
            lambda lg: lg.info("world", local_main_process_only=False, in_order=True)
        )
        assert msgs == ["[process 0] world"]
