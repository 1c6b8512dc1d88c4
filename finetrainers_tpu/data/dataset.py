"""Streaming datasets with resumable state + multi-resolution bucketing.

Capability parity with reference `finetrainers/data/dataset.py` (8 dataset classes,
auto-detection, preprocessing wrapper, combining, validation dataset — see SURVEY.md
§2.6). TPU-first notes: everything here is host-side numpy; decoded samples are
bucketed to static shapes so each bucket maps to one XLA compilation.

Differences from the reference:
  - No torch / torchdata: datasets are plain Python iterables implementing the
    same `state_dict`/`load_state_dict` resume contract (`_sample_index` + skip).
  - Webdataset tars are read with the stdlib tarfile (no webdataset dep).
"""

from __future__ import annotations

import json
import pathlib
import random
import tarfile
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

from .. import constants
from ..functional.image import resize_crop_image, resize_to_nearest_bucket_image
from ..functional.text import convert_byte_str_to_str, remove_prefix
from ..functional.video import resize_crop_video, resize_to_nearest_bucket_video
from ..logging import get_logger
from .utils import load_image, load_video


logger = get_logger(__name__)

MAX_PRECOMPUTABLE_ITEMS_LIMIT = 1024
COMMON_CAPTION_FILES = ["prompt.txt", "prompts.txt", "caption.txt", "captions.txt"]
COMMON_VIDEO_FILES = ["video.txt", "videos.txt"]
COMMON_IMAGE_FILES = ["image.txt", "images.txt"]


class StatefulIterableDataset:
    """Base: iterable with `_sample_index` resume (reference dataset.py:36,68)."""

    def __init__(self, infinite: bool = False) -> None:
        self._infinite = infinite
        self._sample_index = 0
        self._precomputable_once = False

    def _samples(self) -> List[Dict[str, Any]]:
        raise NotImplementedError

    def __len__(self) -> int:
        return len(self._samples())

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        samples = self._samples()
        if not samples:
            return
        while True:
            while self._sample_index < len(samples):
                idx = self._sample_index
                self._sample_index += 1
                yield dict(samples[idx])
            if not self._infinite:
                break
            self._sample_index = 0

    def state_dict(self) -> Dict[str, Any]:
        return {"sample_index": self._sample_index}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self._sample_index = state.get("sample_index", 0)


def _read_caption_file(path: pathlib.Path) -> str:
    return path.read_text().strip()


class ImageCaptionFilePairDataset(StatefulIterableDataset):
    """dir of img.png + img.txt pairs (reference dataset.py:44)."""

    media_key = "image"
    extensions = constants.SUPPORTED_IMAGE_FILE_EXTENSIONS

    def __init__(self, root: str, infinite: bool = False) -> None:
        super().__init__(infinite)
        self.root = pathlib.Path(root)
        data = []
        for ext in self.extensions:
            for media in sorted(self.root.glob(f"*.{ext}")):
                caption_file = media.with_suffix(".txt")
                if caption_file.exists():
                    data.append({"caption": _read_caption_file(caption_file), self.media_key: str(media)})
        self._data = data
        self._precomputable_once = len(data) <= MAX_PRECOMPUTABLE_ITEMS_LIMIT

    def _samples(self):
        return self._data


class VideoCaptionFilePairDataset(ImageCaptionFilePairDataset):
    """(reference dataset.py:117)"""

    media_key = "video"
    extensions = constants.SUPPORTED_VIDEO_FILE_EXTENSIONS


class ImageFileCaptionFileListDataset(StatefulIterableDataset):
    """prompts.txt + images.txt path lists (reference dataset.py:190)."""

    media_key = "image"
    media_files = COMMON_IMAGE_FILES

    def __init__(self, root: str, infinite: bool = False) -> None:
        super().__init__(infinite)
        self.root = pathlib.Path(root)
        caption_file = next(
            (self.root / f for f in COMMON_CAPTION_FILES if (self.root / f).exists()), None
        )
        media_file = next((self.root / f for f in self.media_files if (self.root / f).exists()), None)
        if caption_file is None or media_file is None:
            raise FileNotFoundError(f"Expected caption + media list files in {root}")
        captions = [l.strip() for l in caption_file.read_text().splitlines() if l.strip()]
        media = [l.strip() for l in media_file.read_text().splitlines() if l.strip()]
        if len(captions) != len(media):
            raise ValueError(f"Caption/media list length mismatch: {len(captions)} vs {len(media)}")
        self._data = [
            {"caption": c, self.media_key: str(self.root / m)} for c, m in zip(captions, media)
        ]
        self._precomputable_once = len(self._data) <= MAX_PRECOMPUTABLE_ITEMS_LIMIT

    def _samples(self):
        return self._data


class VideoFileCaptionFileListDataset(ImageFileCaptionFileListDataset):
    """(reference dataset.py:269)"""

    media_key = "video"
    media_files = COMMON_VIDEO_FILES


class ImageFolderDataset(StatefulIterableDataset):
    """metadata.{csv,jsonl,json} + media files (reference dataset.py:348)."""

    media_key = "image"

    def __init__(self, root: str, infinite: bool = False) -> None:
        super().__init__(infinite)
        self.root = pathlib.Path(root)
        rows = _load_metadata(self.root)
        caption_col = next((c for c in constants.CAPTION_COLUMN_NAMES if c in rows[0]), None)
        file_col = next((c for c in ("file_name", "file", "path", "image", "video") if c in rows[0]), None)
        if caption_col is None or file_col is None:
            raise ValueError(f"metadata in {root} must contain caption + file_name columns; got {list(rows[0])}")
        self._data = [
            {"caption": r[caption_col], self.media_key: str(self.root / r[file_col])} for r in rows
        ]
        self._precomputable_once = len(self._data) <= MAX_PRECOMPUTABLE_ITEMS_LIMIT

    def _samples(self):
        return self._data


class VideoFolderDataset(ImageFolderDataset):
    """(reference dataset.py:385)"""

    media_key = "video"


class ImageWebDataset(StatefulIterableDataset):
    """tar OR parquet shards (reference dataset.py:422 + :882,915 treats
    `*.parquet` like tar shards). Tar entries pair `key.jpg + key.txt`; parquet
    rows carry a media column (raw bytes or HF-datasets `{bytes, path}` structs
    under an extension-named or `image`/`video` column) plus caption columns.
    Weighted multi-caption-column selection is supported via `caption_weights`."""

    media_key = "image"
    media_exts = constants.SUPPORTED_IMAGE_FILE_EXTENSIONS

    def __init__(self, root: str, infinite: bool = False, caption_weights: Optional[Dict[str, float]] = None) -> None:
        super().__init__(infinite)
        self.root = pathlib.Path(root)
        self.caption_weights = caption_weights or {}
        if self.root.is_dir():
            self._tars = sorted(self.root.glob("*.tar"))
            self._parquets = sorted(self.root.glob("*.parquet"))
        else:
            self._tars = [self.root] if self.root.suffix == ".tar" else []
            self._parquets = [self.root] if self.root.suffix == ".parquet" else []
        self._index: List[Tuple[str, Any]] = []  # (shard path, sample key | row idx)
        for tar_path in self._tars:
            with tarfile.open(tar_path) as tf:
                keys: Dict[str, Dict[str, str]] = {}
                for member in tf.getmembers():
                    if not member.isfile():
                        continue
                    stem, _, ext = member.name.rpartition(".")
                    keys.setdefault(stem, {})[ext.lower()] = member.name
                for stem, entries in sorted(keys.items()):
                    if any(e in entries for e in self.media_exts):
                        self._index.append((str(tar_path), stem))
        for pq_path in self._parquets:
            import pyarrow.parquet as pq

            n_rows = pq.ParquetFile(pq_path).metadata.num_rows
            self._index.extend((str(pq_path), i) for i in range(n_rows))
        # [path, ParquetFile, row-group start offsets, (group_idx, group_table)]
        self._pq_cache: List[Any] = [None, None, None, (None, None)]
        self._precomputable_once = len(self._index) <= MAX_PRECOMPUTABLE_ITEMS_LIMIT

    def __len__(self) -> int:
        return len(self._index)

    def __iter__(self):
        if not self._index:
            return
        while True:
            while self._sample_index < len(self._index):
                tar_path, stem = self._index[self._sample_index]
                self._sample_index += 1
                yield self._load(tar_path, stem)
            if not self._infinite:
                break
            self._sample_index = 0

    def _choose_caption(self, caption_candidates: Dict[str, str]) -> Optional[str]:
        if not caption_candidates:
            return None
        if self.caption_weights:
            cols = [c for c in caption_candidates if c in self.caption_weights]
            if cols:
                weights = [self.caption_weights[c] for c in cols]
                chosen = random.choices(cols, weights=weights, k=1)[0]
            else:
                chosen = next(iter(caption_candidates))
        else:
            chosen = next(iter(caption_candidates))
        return convert_byte_str_to_str(caption_candidates[chosen])

    def _load_parquet_row(self, pq_path: str, row_idx: int) -> Dict[str, Any]:
        # Keep only the open file handle + ONE decoded row group resident:
        # multi-GB media shards must not be materialized whole in host RAM
        # (sequential iteration still decodes each row group exactly once).
        import bisect

        import pyarrow.parquet as pq

        if self._pq_cache[0] != pq_path:
            pf = pq.ParquetFile(pq_path, memory_map=True)
            starts, off = [], 0
            for g in range(pf.metadata.num_row_groups):
                starts.append(off)
                off += pf.metadata.row_group(g).num_rows
            self._pq_cache = [pq_path, pf, starts, (None, None)]
        _, pf, starts, (group_idx, group_table) = self._pq_cache
        g = bisect.bisect_right(starts, row_idx) - 1
        if group_idx != g:
            group_table = pf.read_row_group(g)
            self._pq_cache[3] = (g, group_table)
        row = group_table.slice(row_idx - starts[g], 1).to_pylist()[0]
        sample: Dict[str, Any] = {}
        caption_candidates: Dict[str, str] = {}
        for col, value in row.items():
            key = col.lower()
            payload, ext = None, None
            if isinstance(value, (bytes, bytearray)):
                payload = bytes(value)
                ext = key if key in self.media_exts else None
            elif isinstance(value, dict) and isinstance(value.get("bytes"), (bytes, bytearray)):
                # HF datasets Image/Video struct encoding {bytes, path}
                payload = bytes(value["bytes"])
                path = value.get("path") or ""
                ext = pathlib.Path(path).suffix.lstrip(".").lower() or None
            if payload is not None and (key == self.media_key or ext in self.media_exts or key in self.media_exts):
                sample[self.media_key + "_bytes"] = payload
                sample[self.media_key + "_ext"] = ext or (key if key in self.media_exts else self.media_exts[0])
            elif isinstance(value, str) and (key in constants.CAPTION_COLUMN_NAMES or key == "txt"):
                caption_candidates[key] = value
        caption = self._choose_caption(caption_candidates)
        sample["caption"] = caption if caption is not None else ""
        return sample

    def _load(self, tar_path: str, stem) -> Dict[str, Any]:
        import io

        if tar_path.endswith(".parquet"):
            return self._load_parquet_row(tar_path, stem)
        with tarfile.open(tar_path) as tf:
            entries = {m.name.rpartition(".")[2].lower(): m for m in tf.getmembers()
                       if m.isfile() and m.name.rpartition(".")[0] == stem}
            sample: Dict[str, Any] = {}
            caption_candidates: Dict[str, str] = {}
            for ext, member in entries.items():
                payload = tf.extractfile(member).read()
                if ext in self.media_exts:
                    sample[self.media_key + "_bytes"] = payload
                    sample[self.media_key + "_ext"] = ext
                elif ext in ("txt",):
                    caption_candidates["txt"] = payload.decode("utf-8", "replace")
                elif ext == "json":
                    meta = json.loads(payload)
                    for col in constants.CAPTION_COLUMN_NAMES:
                        if col in meta and isinstance(meta[col], str):
                            caption_candidates[col] = meta[col]
            caption = self._choose_caption(caption_candidates)
            sample["caption"] = caption if caption is not None else ""
            return sample


class VideoWebDataset(ImageWebDataset):
    """(reference dataset.py:516)"""

    media_key = "video"
    media_exts = constants.SUPPORTED_VIDEO_FILE_EXTENSIONS


class ValidationDataset:
    """CSV/JSON/JSONL/PARQUET/ARROW file -> iterable of dicts; aliases caption->prompt
    and loads media paths (reference dataset.py:609-674)."""

    def __init__(self, filename: str) -> None:
        path = pathlib.Path(filename)
        ext = path.suffix.lower()
        if ext == ".csv":
            import csv

            with open(path, newline="") as f:
                self.rows = [dict(r) for r in csv.DictReader(f)]
        elif ext in (".json",):
            data = json.loads(path.read_text())
            self.rows = data["data"] if isinstance(data, dict) and "data" in data else data
        elif ext in (".jsonl",):
            self.rows = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
        elif ext in (".parquet", ".arrow"):
            import pandas as pd

            df = pd.read_parquet(path) if ext == ".parquet" else pd.read_feather(path)
            self.rows = df.to_dict("records")
        else:
            raise ValueError(f"Unsupported validation dataset format: {ext}")

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for row in self.rows:
            out = dict(row)
            if "caption" in out and "prompt" not in out:
                out["prompt"] = out.pop("caption")
            for key in list(out):
                if key in ("image_path", "control_image_path"):
                    out[key.replace("_path", "")] = load_image(out[key], to_float=False)
                elif key in ("video_path", "control_video_path"):
                    out[key.replace("_path", "")] = load_video(out[key], to_float=False)
            # Numeric fields arrive as strings from CSV
            for key in ("height", "width", "num_frames", "num_inference_steps", "frame_rate"):
                if key in out and isinstance(out[key], str) and out[key].strip():
                    out[key] = int(float(out[key]))
            yield out

    def __len__(self) -> int:
        return len(self.rows)


class IterableDatasetPreprocessingWrapper:
    """Decode + bucket + caption cleanup (reference dataset.py:677-773).

    With ``decode_workers > 0``, decode/resize runs on an order-preserving
    thread pool (the reference's torchdata StatefulDataLoader worker analog):
    the stateful source is still pulled serially on the consumer thread, but
    the expensive `_process` (cv2 decode + bucket resize) of up to
    ``decode_workers + 2`` samples runs concurrently. Resume-exactness is kept
    by snapshotting the source state as each raw sample is pulled and exposing
    the snapshot of the LAST YIELDED sample from ``state_dict()`` — samples
    sitting decoded-but-unconsumed in the pool are re-decoded after a resume,
    never skipped.
    """

    def __init__(
        self,
        dataset: StatefulIterableDataset,
        dataset_type: str,
        id_token: Optional[str] = None,
        image_resolution_buckets: Optional[List[Tuple[int, int]]] = None,
        video_resolution_buckets: Optional[List[Tuple[int, int, int]]] = None,
        reshape_mode: str = "bicubic",
        remove_common_llm_caption_prefixes: bool = False,
        rename_columns: Optional[Dict[str, str]] = None,
        decode_workers: int = 0,
        **kwargs,
    ) -> None:
        self.dataset = dataset
        self.dataset_type = dataset_type
        self.id_token = id_token
        self.image_resolution_buckets = image_resolution_buckets
        self.video_resolution_buckets = video_resolution_buckets
        self.reshape_mode = reshape_mode
        self.remove_common_llm_caption_prefixes = remove_common_llm_caption_prefixes
        self.rename_columns = rename_columns or {}
        self.decode_workers = decode_workers
        self._consumed_state: Optional[Dict[str, Any]] = None
        self._precomputable_once = getattr(dataset, "_precomputable_once", False)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.decode_workers > 0 and hasattr(self.dataset, "state_dict"):
            yield from self._iter_parallel()
            return
        for sample in self.dataset:
            out = self._process(sample)
            if out is not None:
                yield out

    def _iter_parallel(self) -> Iterator[Dict[str, Any]]:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        it = iter(self.dataset)
        pending: "collections.deque" = collections.deque()
        with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:

            def pull() -> bool:
                try:
                    raw = next(it)
                except StopIteration:
                    return False
                # snapshot AFTER the pull: "consumed through this sample"
                snap = self.dataset.state_dict()
                pending.append((pool.submit(self._process, raw), snap))
                return True

            for _ in range(self.decode_workers + 2):
                if not pull():
                    break
            while pending:
                fut, snap = pending.popleft()
                pull()
                out = fut.result()
                # publish before yield: a downstream batch snapshot taken
                # while the consumer holds this sample must include it.
                self._consumed_state = snap
                if out is not None:
                    yield out

    def _process(self, sample: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        if self.rename_columns:
            sample = {self.rename_columns.get(k, k): v for k, v in sample.items()}
        caption = sample.get("caption", "")
        if self.remove_common_llm_caption_prefixes:
            caption = remove_prefix(caption, constants.COMMON_LLM_START_PHRASES)
        if self.id_token:
            caption = f"{self.id_token} {caption}"
        out: Dict[str, Any] = {"caption": caption}

        try:
            if self.dataset_type == "image":
                image = self._decode_image(sample)
                if self.image_resolution_buckets:
                    image = resize_to_nearest_bucket_image(image, self.image_resolution_buckets, self.reshape_mode)
                out["image"] = np.ascontiguousarray(image)
                # Paired control column (e.g. OmniEdit src_img renamed to
                # control_image): decode + pin to the target's bucket so the
                # control trainer sees shape-matched pairs.
                if "control_image" in sample or "control_image_bytes" in sample:
                    ctrl = self._decode_image(sample, "control_image")
                    out["control_image"] = np.ascontiguousarray(
                        resize_crop_image(ctrl, image.shape[-2:])
                    )
            else:
                video = self._decode_video(sample)
                if self.video_resolution_buckets:
                    video, first_frame_only = resize_to_nearest_bucket_video(
                        video, self.video_resolution_buckets, self.reshape_mode
                    )
                    if first_frame_only:
                        video = video[:1]
                out["video"] = np.ascontiguousarray(video)
                if "control_video" in sample or "control_video_bytes" in sample:
                    ctrl = self._decode_video(sample, "control_video")
                    ctrl = resize_crop_video(ctrl, video.shape[-2:])
                    out["control_video"] = np.ascontiguousarray(ctrl[: video.shape[0]])
        except (FileNotFoundError, ValueError) as e:
            logger.warning(f"Skipping sample: {e}")
            return None
        return out

    def _decode_image(self, sample, key: str = "image") -> np.ndarray:
        if f"{key}_bytes" in sample:
            import cv2

            buf = np.frombuffer(sample[f"{key}_bytes"], np.uint8)
            img = cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
            return np.moveaxis(img.astype(np.float32) / 127.5 - 1.0, -1, 0)
        value = sample[key]
        return value if isinstance(value, np.ndarray) else load_image(value)

    def _decode_video(self, sample, key: str = "video") -> np.ndarray:
        if f"{key}_bytes" in sample:
            import tempfile

            with tempfile.NamedTemporaryFile(suffix="." + sample.get(f"{key}_ext", "mp4")) as f:
                f.write(sample[f"{key}_bytes"])
                f.flush()
                return load_video(f.name)
        value = sample[key]
        return value if isinstance(value, np.ndarray) else load_video(value)

    def state_dict(self):
        if self._consumed_state is not None:
            return self._consumed_state
        return self.dataset.state_dict()

    def load_state_dict(self, state):
        self.dataset.load_state_dict(state)
        self._consumed_state = None


class IterableCombinedDataset:
    """Round-robin buffered combination with optional shuffle
    (reference dataset.py:776-820)."""

    def __init__(self, datasets: List[Any], buffer_size: int = 1, shuffle: bool = False, seed: int = 0) -> None:
        self.datasets = datasets
        self.buffer_size = max(buffer_size, 1)
        self.shuffle = shuffle
        self._rng = random.Random(seed)
        self._precomputable_once = all(getattr(d, "_precomputable_once", False) for d in datasets)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        iterators = [iter(d) for d in self.datasets]
        buffer: List[Dict[str, Any]] = []
        active = list(range(len(iterators)))
        while active:
            for idx in list(active):
                try:
                    buffer.append(next(iterators[idx]))
                except StopIteration:
                    active.remove(idx)
            if len(buffer) >= self.buffer_size or not active:
                if self.shuffle:
                    self._rng.shuffle(buffer)
                yield from buffer
                buffer = []

    def state_dict(self):
        return {"datasets": [d.state_dict() for d in self.datasets]}

    def load_state_dict(self, state):
        for d, s in zip(self.datasets, state.get("datasets", [])):
            d.load_state_dict(s)


# ------------------------------------------------------------------ detection


def initialize_dataset(
    dataset_name_or_root: str,
    dataset_type: str = "video",
    streaming: bool = True,
    infinite: bool = False,
    caption_options: Optional[Dict[str, Any]] = None,
):
    """Auto-detect the dataset layout (reference dataset.py:824-1002)."""
    root = pathlib.Path(dataset_name_or_root)
    if not root.exists():
        if _looks_like_hub_id(dataset_name_or_root):
            return _initialize_hub_dataset(
                dataset_name_or_root, dataset_type, infinite, caption_options
            )
        raise FileNotFoundError(
            f"{dataset_name_or_root} does not exist locally and is not a hub dataset id"
        )
    cls_image = dataset_type == "image"

    if root.is_file() and root.suffix in (".tar", ".parquet"):
        cls = ImageWebDataset if cls_image else VideoWebDataset
        return cls(str(root), infinite=infinite, **(caption_options or {}))

    has = lambda name: (root / name).exists()
    if any(has(m) for m in ("metadata.json", "metadata.jsonl", "metadata.csv")):
        cls = ImageFolderDataset if cls_image else VideoFolderDataset
        return cls(str(root), infinite=infinite)
    # tar/parquet shards both count as webdatasets (reference dataset.py:882)
    if list(root.glob("*.tar")) or list(root.glob("*.parquet")):
        cls = ImageWebDataset if cls_image else VideoWebDataset
        return cls(str(root), infinite=infinite, **(caption_options or {}))
    if any(has(f) for f in COMMON_CAPTION_FILES) and (
        any(has(f) for f in COMMON_VIDEO_FILES) or any(has(f) for f in COMMON_IMAGE_FILES)
    ):
        cls = ImageFileCaptionFileListDataset if cls_image else VideoFileCaptionFileListDataset
        return cls(str(root), infinite=infinite)
    # caption-file pair layout
    cls = ImageCaptionFilePairDataset if cls_image else VideoCaptionFilePairDataset
    ds = cls(str(root), infinite=infinite)
    if len(ds) == 0:
        raise ValueError(f"Could not detect a supported dataset layout under {root}")
    return ds


def _looks_like_hub_id(name: str) -> bool:
    import re

    return re.fullmatch(r"[\w][\w.\-]*/[\w][\w.\-]*", name) is not None


def _initialize_hub_dataset(
    repo_id: str,
    dataset_type: str,
    infinite: bool,
    caption_options: Optional[Dict[str, Any]],
):
    """Hub-dataset branch of the auto-detection (reference dataset.py:824-1002
    hub path): list the repo's files to pick the layout, snapshot-download the
    needed subset, and reuse the local dataset classes over the cached copy.
    Requires network access (huggingface_hub)."""
    from huggingface_hub import list_repo_files, snapshot_download

    files = list_repo_files(repo_id, repo_type="dataset")
    cls_image = dataset_type == "image"
    has = lambda name: name in files

    if any(has(m) for m in ("metadata.json", "metadata.jsonl", "metadata.csv")):
        root = snapshot_download(repo_id, repo_type="dataset")
        cls = ImageFolderDataset if cls_image else VideoFolderDataset
        return cls(root, infinite=infinite)
    if any(f.endswith((".tar", ".parquet")) for f in files):
        root = snapshot_download(repo_id, repo_type="dataset", allow_patterns=["*.tar", "*.parquet"])
        cls = ImageWebDataset if cls_image else VideoWebDataset
        return cls(root, infinite=infinite, **(caption_options or {}))
    if any(has(f) for f in COMMON_CAPTION_FILES) and (
        any(has(f) for f in COMMON_VIDEO_FILES) or any(has(f) for f in COMMON_IMAGE_FILES)
    ):
        root = snapshot_download(repo_id, repo_type="dataset")
        cls = ImageFileCaptionFileListDataset if cls_image else VideoFileCaptionFileListDataset
        return cls(root, infinite=infinite)
    root = snapshot_download(repo_id, repo_type="dataset")
    cls = ImageCaptionFilePairDataset if cls_image else VideoCaptionFilePairDataset
    ds = cls(root, infinite=infinite)
    if len(ds) == 0:
        raise ValueError(f"Could not detect a supported dataset layout in hub repo {repo_id}")
    return ds


def combine_datasets(datasets: List[Any], buffer_size: int = 1, shuffle: bool = False) -> Any:
    if len(datasets) == 1 and buffer_size <= 1 and not shuffle:
        return datasets[0]
    return IterableCombinedDataset(datasets, buffer_size=buffer_size, shuffle=shuffle)


def wrap_iterable_dataset_for_preprocessing(dataset, dataset_type: str, config: Dict[str, Any]):
    return IterableDatasetPreprocessingWrapper(dataset, dataset_type, **config)


def _load_metadata(root: pathlib.Path) -> List[Dict[str, Any]]:
    if (root / "metadata.csv").exists():
        import csv

        with open(root / "metadata.csv", newline="") as f:
            return [dict(r) for r in csv.DictReader(f)]
    if (root / "metadata.jsonl").exists():
        return [json.loads(l) for l in (root / "metadata.jsonl").read_text().splitlines() if l.strip()]
    if (root / "metadata.json").exists():
        data = json.loads((root / "metadata.json").read_text())
        return data if isinstance(data, list) else data["data"]
    raise FileNotFoundError(f"No metadata file in {root}")
