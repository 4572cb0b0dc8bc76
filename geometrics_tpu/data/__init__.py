"""Data layer (reference L0 — SURVEY.md §1): synthetic generator, prepared
on-disk trees, batching/prefetch."""

from .loader import BatchIterator, collate, train_test_split
from .shapenet import PreparedDataset
from .synthetic import (
    CLASS_NAMES,
    SyntheticConfig,
    SyntheticShapeDataset,
    generate_shape,
    render_np,
    sample_surface_np,
    voxelize_solid_np,
)

__all__ = [
    "BatchIterator",
    "CLASS_NAMES",
    "PreparedDataset",
    "SyntheticConfig",
    "SyntheticShapeDataset",
    "collate",
    "generate_shape",
    "render_np",
    "sample_surface_np",
    "train_test_split",
    "voxelize_solid_np",
]
