"""Data-layer unit tests (reference tests/data/test_dataset.py: auto-detection +
iteration per dataset class, shapes & captions)."""

import csv
import json
import pathlib
import sys
import tarfile

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.data import (
    ImageCaptionFilePairDataset,
    ImageFolderDataset,
    ImageWebDataset,
    IterableCombinedDataset,
    ValidationDataset,
    VideoFileCaptionFileListDataset,
    VideoFolderDataset,
    initialize_dataset,
    wrap_iterable_dataset_for_preprocessing,
)


def _write_png(path, h=32, w=32):
    import cv2

    cv2.imwrite(str(path), np.random.randint(0, 255, (h, w, 3), np.uint8))


def _write_mp4(path, frames=6, h=32, w=32):
    import cv2

    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (w, h))
    for _ in range(frames):
        writer.write(np.random.randint(0, 255, (h, w, 3), np.uint8))
    writer.release()


class TestDetection:
    def test_caption_file_pairs(self, tmp_path):
        _write_png(tmp_path / "a.png")
        (tmp_path / "a.txt").write_text("an image")
        ds = initialize_dataset(str(tmp_path), "image")
        assert isinstance(ds, ImageCaptionFilePairDataset)
        sample = next(iter(ds))
        assert sample["caption"] == "an image"

    def test_metadata_folder(self, tmp_path):
        _write_mp4(tmp_path / "v.mp4")
        with open(tmp_path / "metadata.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file_name", "caption"])
            w.writeheader()
            w.writerow({"file_name": "v.mp4", "caption": "a video"})
        ds = initialize_dataset(str(tmp_path), "video")
        assert isinstance(ds, VideoFolderDataset)

    def test_file_lists(self, tmp_path):
        _write_mp4(tmp_path / "v0.mp4")
        (tmp_path / "prompts.txt").write_text("first video\n")
        (tmp_path / "videos.txt").write_text("v0.mp4\n")
        ds = initialize_dataset(str(tmp_path), "video")
        assert isinstance(ds, VideoFileCaptionFileListDataset)

    def test_webdataset_tar(self, tmp_path):
        import cv2

        img_path = tmp_path / "000.jpg"
        _write_png(img_path)
        (tmp_path / "000.txt").write_text("tar caption")
        with tarfile.open(tmp_path / "shard.tar", "w") as tf:
            tf.add(img_path, arcname="000.jpg")
            tf.add(tmp_path / "000.txt", arcname="000.txt")
        img_path.unlink()
        (tmp_path / "000.txt").unlink()
        ds = initialize_dataset(str(tmp_path), "image")
        assert isinstance(ds, ImageWebDataset)
        sample = next(iter(ds))
        assert sample["caption"] == "tar caption"
        assert "image_bytes" in sample

    def test_webdataset_parquet(self, tmp_path):
        """Parquet shards are webdatasets, like the reference's tar-or-parquet
        detection (reference data/dataset.py:882,915)."""
        import io

        import cv2
        import pyarrow as pa
        import pyarrow.parquet as pq

        ok, buf = cv2.imencode(".jpg", np.random.randint(0, 255, (32, 32, 3), np.uint8))
        assert ok
        jpg_bytes = buf.tobytes()
        table = pa.table({
            "jpg": [jpg_bytes, jpg_bytes],
            "caption": ["parquet caption 0", "parquet caption 1"],
        })
        pq.write_table(table, tmp_path / "shard-000.parquet")
        ds = initialize_dataset(str(tmp_path), "image")
        assert isinstance(ds, ImageWebDataset)
        assert len(ds) == 2
        samples = list(iter(ds))
        assert [s["caption"] for s in samples] == ["parquet caption 0", "parquet caption 1"]
        assert samples[0]["image_bytes"] == jpg_bytes
        assert samples[0]["image_ext"] == "jpg"

    def test_webdataset_parquet_hf_image_struct(self, tmp_path):
        """HF-datasets-style {bytes, path} media structs in parquet rows."""
        import cv2
        import pyarrow as pa
        import pyarrow.parquet as pq

        ok, buf = cv2.imencode(".png", np.random.randint(0, 255, (16, 16, 3), np.uint8))
        png_bytes = buf.tobytes()
        table = pa.table({
            "image": [{"bytes": png_bytes, "path": "x.png"}],
            "prompt": ["struct caption"],
        })
        pq.write_table(table, tmp_path / "data.parquet")
        # single-file path, video_type=image
        ds = initialize_dataset(str(tmp_path / "data.parquet"), "image")
        sample = next(iter(ds))
        assert sample["caption"] == "struct caption"
        assert sample["image_bytes"] == png_bytes
        assert sample["image_ext"] == "png"

    def test_missing_raises(self):
        with pytest.raises(FileNotFoundError):
            initialize_dataset("/nonexistent/path", "video")


class TestIterationAndState:
    def test_resume_state(self, tmp_path):
        for i in range(3):
            _write_png(tmp_path / f"{i}.png")
            (tmp_path / f"{i}.txt").write_text(f"caption {i}")
        ds = ImageCaptionFilePairDataset(str(tmp_path))
        it = iter(ds)
        first = next(it)
        state = ds.state_dict()
        ds2 = ImageCaptionFilePairDataset(str(tmp_path))
        ds2.load_state_dict(state)
        second = next(iter(ds2))
        assert second["caption"] != first["caption"]

    def test_infinite_looping(self, tmp_path):
        _write_png(tmp_path / "a.png")
        (tmp_path / "a.txt").write_text("x")
        ds = ImageCaptionFilePairDataset(str(tmp_path), infinite=True)
        it = iter(ds)
        samples = [next(it) for _ in range(5)]
        assert len(samples) == 5

    def test_combined_round_robin(self, tmp_path):
        for name in ("a", "b"):
            d = tmp_path / name
            d.mkdir()
            _write_png(d / "x.png")
            (d / "x.txt").write_text(name)
        ds = IterableCombinedDataset(
            [ImageCaptionFilePairDataset(str(tmp_path / "a")),
             ImageCaptionFilePairDataset(str(tmp_path / "b"))]
        )
        captions = sorted(s["caption"] for s in ds)
        assert captions == ["a", "b"]


class TestPreprocessingWrapper:
    def test_image_bucketing_and_prefix(self, tmp_path):
        _write_png(tmp_path / "a.png", h=100, w=100)
        (tmp_path / "a.txt").write_text("The video shows a cat")
        ds = ImageCaptionFilePairDataset(str(tmp_path))
        wrapped = wrap_iterable_dataset_for_preprocessing(
            ds, "image",
            {"image_resolution_buckets": [(32, 32)], "id_token": "TOK",
             "remove_common_llm_caption_prefixes": True},
        )
        sample = next(iter(wrapped))
        assert sample["image"].shape == (3, 32, 32)
        assert sample["caption"] == "TOK shows a cat"
        assert sample["image"].dtype == np.float32
        # bicubic interpolation overshoots slightly (reference behavior: no clamp)
        assert -1.6 <= sample["image"].min() and sample["image"].max() <= 1.6

    def test_rename_columns_and_control_passthrough(self):
        """OmniEdit-style paired control data: rename_columns maps the source
        column onto control_image, and the wrapper decodes + shape-matches it
        (reference dataset.py rename_column handling in the hub branch)."""

        class FakeDS:
            def __iter__(self):
                yield {
                    "caption": "edit it",
                    "image": np.zeros((3, 100, 100), np.float32),
                    "src_img": np.zeros((3, 50, 80), np.float32),
                }

        wrapped = wrap_iterable_dataset_for_preprocessing(
            FakeDS(), "image",
            {"image_resolution_buckets": [(32, 32)],
             "rename_columns": {"src_img": "control_image"}},
        )
        sample = next(iter(wrapped))
        assert sample["image"].shape == (3, 32, 32)
        assert sample["control_image"].shape == (3, 32, 32)
        assert "src_img" not in sample

    def test_video_bucketing(self, tmp_path):
        _write_mp4(tmp_path / "v.mp4", frames=8, h=64, w=64)
        (tmp_path / "v.txt").write_text("clip")
        from finetrainers_tpu.data import VideoCaptionFilePairDataset

        ds = VideoCaptionFilePairDataset(str(tmp_path))
        wrapped = wrap_iterable_dataset_for_preprocessing(
            ds, "video", {"video_resolution_buckets": [(4, 32, 32)]},
        )
        sample = next(iter(wrapped))
        assert sample["video"].shape == (4, 3, 32, 32)


class TestParallelDecode:
    """decode_workers > 0: order-preserving threaded decode, resume-exact
    state (the torchdata StatefulDataLoader num_workers analog; reference
    data/dataloader.py:13-40)."""

    def _make(self, tmp_path, n=8):
        for i in range(n):
            _write_png(tmp_path / f"{i:02d}.png")
            (tmp_path / f"{i:02d}.txt").write_text(f"caption {i}")

    def _wrap(self, tmp_path, workers):
        ds = ImageCaptionFilePairDataset(str(tmp_path))
        return wrap_iterable_dataset_for_preprocessing(
            ds, "image",
            {"image_resolution_buckets": [(32, 32)], "decode_workers": workers},
        )

    def test_order_matches_serial(self, tmp_path):
        self._make(tmp_path)
        serial = [s["caption"] for s in self._wrap(tmp_path, 0)]
        parallel = [s["caption"] for s in self._wrap(tmp_path, 3)]
        assert parallel == serial
        assert len(parallel) == 8

    def test_state_reflects_consumed_not_prefetched(self, tmp_path):
        self._make(tmp_path)
        wrapped = self._wrap(tmp_path, 4)
        it = iter(wrapped)
        consumed = [next(it)["caption"] for _ in range(2)]
        # the pool has pulled up to 4+2 samples ahead; the published state
        # must cover exactly the 2 consumed ones
        state = wrapped.state_dict()
        fresh = self._wrap(tmp_path, 0)
        fresh.load_state_dict(state)
        rest = [s["caption"] for s in fresh]
        assert consumed + rest == [f"caption {i}" for i in range(8)]

    def test_resume_into_parallel_wrapper(self, tmp_path):
        self._make(tmp_path)
        wrapped = self._wrap(tmp_path, 2)
        it = iter(wrapped)
        consumed = [next(it)["caption"] for _ in range(5)]
        state = wrapped.state_dict()
        fresh = self._wrap(tmp_path, 2)
        fresh.load_state_dict(state)
        rest = [s["caption"] for s in fresh]
        assert consumed + rest == [f"caption {i}" for i in range(8)]

    def test_decoded_output_matches_serial(self, tmp_path):
        self._make(tmp_path, n=4)
        serial = [s["image"] for s in self._wrap(tmp_path, 0)]
        parallel = [s["image"] for s in self._wrap(tmp_path, 3)]
        for a, b in zip(serial, parallel):
            np.testing.assert_array_equal(a, b)


class TestValidationDataset:
    def test_csv_aliases_and_types(self, tmp_path):
        path = tmp_path / "val.csv"
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["caption", "height", "width", "num_frames"])
            w.writeheader()
            w.writerow({"caption": "hello", "height": "32", "width": "48", "num_frames": "5"})
        ds = ValidationDataset(str(path))
        sample = next(iter(ds))
        assert sample["prompt"] == "hello"
        assert sample["height"] == 32 and isinstance(sample["height"], int)

    def test_json(self, tmp_path):
        path = tmp_path / "val.json"
        path.write_text(json.dumps({"data": [{"prompt": "p1"}, {"prompt": "p2"}]}))
        ds = ValidationDataset(str(path))
        assert len(ds) == 2

    def test_jsonl(self, tmp_path):
        path = tmp_path / "val.jsonl"
        path.write_text('{"caption": "a"}\n{"caption": "b"}\n')
        ds = ValidationDataset(str(path))
        assert [s["prompt"] for s in ds] == ["a", "b"]

    def test_parquet(self, tmp_path):
        import pandas as pd

        path = tmp_path / "val.parquet"
        pd.DataFrame([{"caption": "x", "height": 16}]).to_parquet(path)
        ds = ValidationDataset(str(path))
        sample = next(iter(ds))
        assert sample["prompt"] == "x"


class TestHubStreaming:
    """Hub branch of initialize_dataset (reference dataset.py:824-1002): layout
    detection via list_repo_files + snapshot_download, exercised offline by
    monkeypatching huggingface_hub against a local tree."""

    def _fake_hub(self, monkeypatch, root):
        import huggingface_hub

        files = [str(p.relative_to(root)) for p in root.rglob("*") if p.is_file()]
        monkeypatch.setattr(
            huggingface_hub, "list_repo_files", lambda repo_id, repo_type=None: files
        )
        monkeypatch.setattr(
            huggingface_hub, "snapshot_download",
            lambda repo_id, repo_type=None, allow_patterns=None: str(root),
        )

    def test_hub_metadata_folder(self, tmp_path, monkeypatch):
        _write_mp4(tmp_path / "v.mp4")
        with open(tmp_path / "metadata.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file_name", "caption"])
            w.writeheader()
            w.writerow({"file_name": "v.mp4", "caption": "a hub video"})
        self._fake_hub(monkeypatch, tmp_path)
        ds = initialize_dataset("someorg/somedata", "video")
        assert isinstance(ds, VideoFolderDataset)
        assert next(iter(ds))["caption"] == "a hub video"

    def test_hub_caption_pairs(self, tmp_path, monkeypatch):
        _write_png(tmp_path / "a.png")
        (tmp_path / "a.txt").write_text("a hub image")
        self._fake_hub(monkeypatch, tmp_path)
        ds = initialize_dataset("someorg/pairs", "image")
        assert isinstance(ds, ImageCaptionFilePairDataset)
        assert next(iter(ds))["caption"] == "a hub image"

    def test_non_hub_name_raises(self):
        with pytest.raises(FileNotFoundError):
            initialize_dataset("definitely not a repo id", "video")
