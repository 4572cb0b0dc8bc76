"""Batching / collation: host samples → device-ready padded arrays.

The reference has no loader abstraction (per-sample Python loop, SURVEY.md
§3.3 ★).  Here batches are fixed-shape dicts of stacked numpy arrays so the
jitted train step compiles exactly once; an optional background prefetch
thread overlaps host-side sample generation with device compute (the TPU
equivalent of a dataloader worker pool — host→HBM transfer is the only
boundary).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .synthetic import SyntheticShapeDataset


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


class BatchIterator:
    """Epoch iterator with shuffling and optional background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        indices: Optional[Sequence[int]] = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(dataset)))
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _batch_indices(self) -> List[np.ndarray]:
        idx = self.indices.copy()
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])).shuffle(idx)
        n_full = len(idx) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        if not self.drop_remainder and len(idx) % self.batch_size:
            batches.append(idx[n_full * self.batch_size:])
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        self._epoch += 1
        if self.prefetch <= 0:
            for b in batches:
                yield collate([self.dataset.get(int(i)) for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in batches:
                    q.put(collate([self.dataset.get(int(i)) for i in b]))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def train_test_split(dataset: SyntheticShapeDataset, test_fraction: float = 0.2):
    """Per-class split in MODEL units (mirrors the reference's 3D-R2N2 split
    lists): with multi-view rendering, all views of a model land on the same
    side — no view leakage across the split."""
    views = getattr(dataset.config, "views_per_model", 1)
    models = dataset.config.models_per_class
    per = models * views
    n_test_models = max(1, int(models * test_fraction))
    train_idx, test_idx = [], []
    for c in range(dataset.config.num_classes):
        base = c * per
        cut = base + (models - n_test_models) * views
        train_idx.extend(range(base, cut))
        test_idx.extend(range(cut, base + per))
    return np.array(train_idx), np.array(test_idx)
