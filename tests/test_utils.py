"""Utility-layer unit tests (reference utils/file.py + utils/hub.py surface)."""

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.utils.file import delete_files, find_files, string_to_filename
from finetrainers_tpu.utils.hub import save_model_card


class TestFileUtils:
    def test_find_files_depth(self, tmp_path):
        (tmp_path / "a.txt").write_text("x")
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "b.txt").write_text("x")
        (tmp_path / "sub" / "deep").mkdir()
        (tmp_path / "sub" / "deep" / "c.txt").write_text("x")
        assert len(find_files(str(tmp_path), "*.txt", depth=0)) == 1
        assert len(find_files(str(tmp_path), "*.txt", depth=1)) == 2
        assert len(find_files(str(tmp_path), "*.txt", depth=5)) == 3

    def test_find_files_missing_root(self):
        assert find_files("/nonexistent/nowhere", "*.txt") == []

    def test_delete_files(self, tmp_path):
        d = tmp_path / "gone"
        d.mkdir()
        (d / "f").write_text("x")
        delete_files([d, tmp_path / "never-existed"])
        assert not d.exists()

    def test_string_to_filename(self):
        assert string_to_filename("a b/c:d.e,f;g!h?i") == "a-b-c-d-e-f-g-h-i"


class TestModelCard:
    def test_save_model_card_contents(self, tmp_path):
        path = save_model_card(
            str(tmp_path),
            base_model="org/base-model",
            model_name="my-lora",
            training_details={"steps": 100, "learning_rate": 1e-4},
            validation_prompts=["a cat", "a dog"],
            media="video",
        )
        text = pathlib.Path(path).read_text()
        assert "org/base-model" in text
        assert "my-lora" in text
        assert "steps" in text and "100" in text
        assert "a cat" in text


class TestMemoryUtils:
    def test_bytes_to_gigabytes(self):
        from finetrainers_tpu.utils.memory import bytes_to_gigabytes

        assert bytes_to_gigabytes(1024**3) == 1.0
        assert bytes_to_gigabytes(None) is None

    def test_get_memory_statistics_keys(self):
        from finetrainers_tpu.utils.memory import get_memory_statistics

        stats = get_memory_statistics()
        assert "memory_allocated" in stats

    def test_make_contiguous(self):
        import numpy as np

        from finetrainers_tpu.utils.memory import make_contiguous

        x = np.arange(12).reshape(3, 4)[:, ::2]
        assert not x.flags["C_CONTIGUOUS"]
        assert make_contiguous(x).flags["C_CONTIGUOUS"]


class TestImportGates:
    def test_gates_return_bool(self):
        from finetrainers_tpu.utils import import_utils as iu

        assert iu.is_cv2_available() is True
        assert iu.is_transformers_available() is True
        assert isinstance(iu.is_wandb_available(), bool)
        assert iu.get_version("numpy") is not None
        assert iu.get_version("definitely_not_a_module") is None
