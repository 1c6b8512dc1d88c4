"""Condition/latent precomputation. Parity with reference `data/precomputation.py:16-420`:

  - `initialize_preprocessor` picks in-memory vs on-disk precomputed mode;
  - `consume` (refillable buffer; `requires_data` signals a refill) vs
    `consume_once` (fixed set cycled infinitely);
  - precomputed files live in `{precomputation_dir}/finetrainers-precomputed-data`
    as `{data_type}-{rank*num_items+i}.npz` (npz instead of .pt);
  - reuse mode validates an existing directory.
"""

from __future__ import annotations

import os
import pathlib
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from ..constants import PRECOMPUTED_DIR_NAME
from ..logging import get_logger


logger = get_logger(__name__)


def initialize_preprocessor(
    rank: int,
    num_items: int,
    processor_fn: Dict[str, Callable[[Dict[str, Any]], Dict[str, Any]]],
    save_dir: Optional[str] = None,
    enable_precomputation: bool = False,
):
    if enable_precomputation:
        return PrecomputedDistributedDataPreprocessor(rank, num_items, processor_fn, save_dir)
    return InMemoryDistributedDataPreprocessor(rank, num_items, processor_fn)


class BasePreprocessor:
    def __init__(self, rank: int, num_items: int, processor_fn: Dict[str, Callable]) -> None:
        self._rank = rank
        self._num_items = num_items
        self._processor_fn = processor_fn

    def consume(self, data_type: str, data_iterator, **kwargs) -> Iterator[Dict[str, Any]]:
        raise NotImplementedError

    def consume_once(self, data_type: str, data_iterator, **kwargs) -> Iterator[Dict[str, Any]]:
        raise NotImplementedError

    @property
    def requires_data(self) -> bool:
        raise NotImplementedError


class InMemoryDataBuffer:
    """FIFO with a max size (reference precomputation.py InMemoryDataBuffer)."""

    def __init__(self, max_limit: int = -1) -> None:
        self.max_limit = max_limit
        self._buffers: Dict[str, List[Any]] = {}

    def add(self, data_type: str, item: Any) -> None:
        buf = self._buffers.setdefault(data_type, [])
        if self.max_limit >= 0 and len(buf) >= self.max_limit:
            buf.pop(0)
        buf.append(item)

    def get(self, data_type: str) -> Any:
        return self._buffers[data_type].pop(0)

    def size(self, data_type: str) -> int:
        return len(self._buffers.get(data_type, []))


class InMemoryDistributedDataPreprocessor(BasePreprocessor):
    """Rolling in-memory buffer of `num_items` processed samples
    (reference InMemoryDistributedDataPreprocessor)."""

    def __init__(self, rank, num_items, processor_fn) -> None:
        super().__init__(rank, num_items, processor_fn)
        self._buffer = InMemoryDataBuffer(max_limit=-1)
        self._cached_samples: List[Dict[str, Any]] = []

    def consume(
        self, data_type: str, data_iterator, cache_samples: bool = False,
        use_cached_samples: bool = False, drop_samples: bool = False, **components,
    ) -> "InMemoryDataIterable":
        fn = self._processor_fn[data_type]
        for i in range(self._num_items):
            if use_cached_samples:
                sample = self._cached_samples[i]
            else:
                sample = next(data_iterator)
                if cache_samples:
                    self._cached_samples.append(sample)
            self._buffer.add(data_type, fn(**sample, **components))
        if drop_samples:
            self._cached_samples = []
        self._preprocessed_iterator = InMemoryDataIterable(self._rank, data_type, self._buffer)
        return self._preprocessed_iterator

    def consume_once(self, data_type: str, data_iterator, cache_samples: bool = False,
                     use_cached_samples: bool = False, drop_samples: bool = False, **components,
                     ) -> "InMemoryOnceDataIterable":
        fn = self._processor_fn[data_type]
        for i in range(self._num_items):
            if use_cached_samples:
                sample = self._cached_samples[i]
            else:
                sample = next(data_iterator)
                if cache_samples:
                    self._cached_samples.append(sample)
            self._buffer.add(data_type, fn(**sample, **components))
        if drop_samples:
            self._cached_samples = []
        self._preprocessed_iterator = InMemoryOnceDataIterable(self._rank, data_type, self._buffer)
        return self._preprocessed_iterator

    @property
    def requires_data(self) -> bool:
        # Delegate to the live (latent) iterable, reference precomputation.py:129-132:
        # the once-iterable cycles forever and NEVER requires data; the regular
        # iterable flips to True when its last item is yielded. Checking raw
        # buffer size here is wrong — a drained once-buffer would re-trigger a
        # refill, silently replacing the cycling set with fresh items.
        it = getattr(self, "_preprocessed_iterator", None)
        return True if it is None else it.requires_data


class InMemoryDataIterable:
    """Yields until the buffer drains; flags requires_data on the last item
    (reference InMemoryDataIterable, precomputation.py:262-287)."""

    def __init__(self, rank: int, data_type: str, buffer: InMemoryDataBuffer) -> None:
        self._rank = rank
        self._data_type = data_type
        self._buffer = buffer
        self._requires_data = False

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while self._buffer.size(self._data_type) > 0:
            if self._buffer.size(self._data_type) == 1:
                self._requires_data = True
            yield self._buffer.get(self._data_type)

    def __len__(self) -> int:
        return self._buffer.size(self._data_type)

    @property
    def requires_data(self) -> bool:
        return self._requires_data


class InMemoryOnceDataIterable:
    """Cycles the buffer infinitely by re-appending each popped item
    (reference InMemoryOnceDataIterable, precomputation.py:290-316); never
    requires data."""

    def __init__(self, rank: int, data_type: str, buffer: InMemoryDataBuffer) -> None:
        self._rank = rank
        self._data_type = data_type
        self._buffer = buffer

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        assert self._buffer.size(self._data_type) > 0
        while True:
            item = self._buffer.get(self._data_type)
            self._buffer.add(self._data_type, item)
            yield item

    def __len__(self) -> int:
        return self._buffer.size(self._data_type)

    @property
    def requires_data(self) -> bool:
        return False


class PrecomputedDistributedDataPreprocessor(BasePreprocessor):
    """Saves processed samples as npz under
    `{save_dir}/finetrainers-precomputed-data` (reference
    PrecomputedDistributedDataPreprocessor; file naming `{data_type}-{index}`)."""

    def __init__(self, rank, num_items, processor_fn, save_dir: str) -> None:
        super().__init__(rank, num_items, processor_fn)
        self._save_dir = pathlib.Path(save_dir) / PRECOMPUTED_DIR_NAME
        self._save_dir.mkdir(parents=True, exist_ok=True)
        self._consumed_once = False

    def _path(self, data_type: str, i: int) -> pathlib.Path:
        return self._save_dir / f"{data_type}-{self._rank * self._num_items + i}.npz"

    def consume(self, data_type: str, data_iterator, cache_samples: bool = False,
                use_cached_samples: bool = False, drop_samples: bool = False, **components,
                ) -> "PrecomputedDataIterable":
        fn = self._processor_fn[data_type]
        if not hasattr(self, "_cached_samples"):
            self._cached_samples = []
        for i in range(self._num_items):
            if use_cached_samples:
                sample = self._cached_samples[i]
            else:
                sample = next(data_iterator)
                if cache_samples:
                    self._cached_samples.append(sample)
            out = fn(**sample, **components)
            np.savez(self._path(data_type, i), **_only_arrays(out))
        if drop_samples:
            self._cached_samples = []
        self._preprocessed_iterator = PrecomputedDataIterable(
            self._rank, self._num_items, data_type, str(self._save_dir))
        return self._preprocessed_iterator

    def consume_once(self, data_type: str, data_iterator, **kwargs) -> "PrecomputedOnceDataIterable":
        self.consume(data_type, data_iterator, **kwargs)
        self._consumed_once = True
        self._preprocessed_iterator = PrecomputedOnceDataIterable(
            self._rank, self._num_items, data_type, str(self._save_dir))
        return self._preprocessed_iterator

    @classmethod
    def load_existing(cls, rank: int, num_items: int, save_dir: str, data_type: str):
        """Reuse mode: validate + iterate a previously-precomputed dir
        (reference precomputation_reuse)."""
        root = pathlib.Path(save_dir) / PRECOMPUTED_DIR_NAME
        expected = [root / f"{data_type}-{rank * num_items + i}.npz" for i in range(num_items)]
        missing = [p for p in expected if not p.exists()]
        if missing:
            raise FileNotFoundError(f"Precomputed data missing {len(missing)} files, e.g. {missing[0]}")
        return PrecomputedOnceDataIterable(rank, num_items, data_type, str(root.parent))

    @property
    def requires_data(self) -> bool:
        # Same delegation as the in-memory preprocessor (reference
        # precomputation.py:256-259): once-iterables never require data; the
        # regular iterable requires a re-consume after its last item.
        it = getattr(self, "_preprocessed_iterator", None)
        return True if it is None else it.requires_data


class PrecomputedDataIterable:
    def __init__(self, rank: int, num_items: int, data_type: str, save_dir: str) -> None:
        root = pathlib.Path(save_dir)
        self._root = root if root.name == PRECOMPUTED_DIR_NAME else root / PRECOMPUTED_DIR_NAME
        self._rank = rank
        self._num_items = num_items
        self._data_type = data_type
        self._requires_data = False

    def _load(self, i: int) -> Dict[str, Any]:
        with np.load(self._root / f"{self._data_type}-{self._rank * self._num_items + i}.npz",
                     allow_pickle=True) as z:
            return {k: z[k] for k in z.files}

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i in range(self._num_items):
            if i == self._num_items - 1:
                self._requires_data = True
            yield self._load(i)

    def __len__(self) -> int:
        return self._num_items

    @property
    def requires_data(self) -> bool:
        return self._requires_data


class PrecomputedOnceDataIterable(PrecomputedDataIterable):
    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while True:
            for i in range(self._num_items):
                yield self._load(i)

    @property
    def requires_data(self) -> bool:
        return False


def _only_arrays(d: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in d.items():
        try:
            out[k] = np.asarray(v)
        except Exception:
            logger.debug(f"Dropping non-array key {k} from precomputed sample")
    return out
