"""On-disk dataset loader for prepared sample trees (data/prep.py layout).

The reference trains from per-sample files written by data_prep.py
(SURVEY.md §3.1 last step).  This loader reads the same contract back —
whether the tree came from the synthetic generator or from a real
preprocessed ShapeNet dump in the same layout.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


class PreparedDataset:
    """Map-style dataset over an on-disk tree written by prepare_dataset.

    Exposes the same ``get(i)`` sample-dict schema as SyntheticShapeDataset
    (BatchIterator works on either), plus ``config``-compatible attributes
    used by the split helper.
    """

    def __init__(self, root: str, split: str = "train",
                 keys: Optional[List[str]] = None,
                 cache_size: int = 256):
        self.root = root
        self.split = split
        with open(os.path.join(root, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        with open(os.path.join(root, f"{split}_list.txt")) as fh:
            self.files = [l.strip() for l in fh if l.strip()]
        self.keys = keys
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._cache_size = cache_size

    def __len__(self) -> int:
        return len(self.files)

    @property
    def diameter(self) -> float:
        """Shape-normalization diameter, for eval threshold matching.

        Trees whose manifest predates unit-diameter normalization (round 1)
        were built at norm_radius=0.9 → diameter 1.8; evaluate() uses this to
        report the geometrically scale-matched F1 columns for them."""
        return 2.0 * float(self.manifest.get("norm_radius", 0.9))

    def class_of(self, index: int) -> int:
        return int(self.files[index].split("_")[0])

    def get(self, index: int) -> Dict[str, np.ndarray]:
        if index in self._cache:
            return self._cache[index]
        with np.load(os.path.join(self.root, self.split, self.files[index])) as z:
            sample = {k: z[k] for k in (self.keys or z.files)}
        if "image" in sample and sample["image"].dtype == np.uint8:
            # prep stores renders as uint8; the sample contract is f32 [0,1]
            sample["image"] = sample["image"].astype(np.float32) / 255.0
        if len(self._cache) < self._cache_size:
            self._cache[index] = sample
        return sample
