"""Dataset preparation: materialize per-sample files + split lists to disk.

data_prep.py equivalent (SURVEY.md §2.1 #1, §3.1).  The reference downloads
3D-R2N2 ShapeNet renders + CAD meshes, then per model: normalize mesh, sample
GT surface points, voxelize via the external ``binvox`` binary, write
per-sample files and train/test split lists.

This environment has no network (SURVEY.md §0), so the source here is the
synthetic generator (data/synthetic.py); the on-disk layout below is what
data/shapenet.py reads back, and a real preprocessed ShapeNet tree in the
same layout is a drop-in replacement.  Voxelization uses the native C++
voxelizer (native/) when built — the binvox-subprocess stand-in — else the
numpy flood-fill twin.

Layout:  root/
           manifest.json                 (config + class names + counts)
           {split}/{class:02d}_{model:04d}.npz   (one sample per file)
           train_list.txt / test_list.txt
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from .loader import train_test_split
from .synthetic import CLASS_NAMES, SyntheticConfig, SyntheticShapeDataset


def prepare_dataset(root: str, config: SyntheticConfig = SyntheticConfig(),
                    test_fraction: float = 0.2,
                    verbose: bool = True) -> Dict[str, int]:
    """Generate and write the full dataset tree.  Idempotent (skips existing)."""
    ds = SyntheticShapeDataset(config)
    train_idx, test_idx = train_test_split(ds, test_fraction)
    os.makedirs(root, exist_ok=True)
    splits = {"train": train_idx, "test": test_idx}
    written = 0
    for split, indices in splits.items():
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        names = []
        for i in indices:
            c = ds.class_of(int(i))
            within = int(i) % (config.models_per_class * config.views_per_model)
            m, v = divmod(within, config.views_per_model)
            name = (f"{c:02d}_{m:04d}.npz" if config.views_per_model == 1
                    else f"{c:02d}_{m:04d}_v{v:02d}.npz")
            names.append(name)
            path = os.path.join(sdir, name)
            if os.path.exists(path):
                continue
            sample = dict(ds.get(int(i)))
            if "image" in sample and sample["image"].dtype != np.uint8:
                # store renders as uint8 (4× smaller tree, faster loads);
                # PreparedDataset decodes back to float32 in [0,1]
                sample["image"] = np.clip(
                    np.rint(sample["image"] * 255.0), 0, 255).astype(np.uint8)
            np.savez_compressed(path, **sample)
            written += 1
            if verbose and written % 20 == 0:
                print(f"[prep] {written} samples written", flush=True)
        with open(os.path.join(root, f"{split}_list.txt"), "w") as fh:
            fh.write("\n".join(names) + "\n")
    manifest = {
        "class_names": CLASS_NAMES[:config.num_classes],
        "num_classes": config.num_classes,
        "models_per_class": config.models_per_class,
        "views_per_model": config.views_per_model,
        "gt_points": config.gt_points,
        "image_size": config.image_size,
        "voxel_res": config.voxel_res,
        "seed": config.seed,
        "norm_radius": config.norm_radius,
        "num_train": len(train_idx),
        "num_test": len(test_idx),
    }
    with open(os.path.join(root, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return {"written": written, **{k: len(v) for k, v in splits.items()}}


def main(argv=None) -> None:
    from ..utils.cli import parse_into
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class PrepConfig:
        root: str = "data/synthetic_shapenet"
        num_classes: int = 13
        models_per_class: int = 32
        views_per_model: int = 1
        gt_points: int = 4096
        voxels: bool = True     # skip for pure train/eval trees (the AE
                                # pretrain set is the only voxel consumer)
        seed: int = 0
        test_fraction: float = 0.2

    cfg = parse_into(PrepConfig(), argv)
    stats = prepare_dataset(
        cfg.root,
        SyntheticConfig(num_classes=cfg.num_classes,
                        models_per_class=cfg.models_per_class,
                        views_per_model=cfg.views_per_model,
                        gt_points=cfg.gt_points, voxels=cfg.voxels,
                        seed=cfg.seed),
        cfg.test_fraction)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
