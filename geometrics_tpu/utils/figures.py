"""Qualitative figure dumps: input | predicted mesh | GT mesh render grids.

The reference repo ships rendered reconstruction figures in its README
(SURVEY.md §2.1 #14); this is the equivalent eyeballing artifact, produced
with the same z-buffered rasterizer the synthetic data pipeline uses
(data/synthetic.py) so predictions are rendered under the exact input camera.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def mesh_sample_arrays(mesh, i: int):
    """Host MeshBuffer sample → (padded verts [V,3], live faces [F',3])."""
    v = np.asarray(mesh.verts[i])
    fm = np.asarray(mesh.face_mask[i]) > 0
    f = np.asarray(mesh.faces[i])[fm]
    return v, f


def save_comparison_grid(path: str, batch: Dict[str, np.ndarray], pred_mesh,
                         n: int = 4) -> str:
    """Write an n-row [input render | pred render | GT render] PNG grid."""
    from PIL import Image

    from ..data.synthetic import render_np

    rng = np.random.default_rng(0)
    n = min(n, len(batch["image"]))
    rows = []
    for i in range(n):
        img = np.asarray(batch["image"][i], np.float32)
        image_size = img.shape[0]  # render companions at the input's size
        az = float(batch["azimuth"][i])
        el = float(batch["elevation"][i])
        di = float(batch["distance"][i])
        pv, pf = mesh_sample_arrays(pred_mesh, i)
        pred = render_np(pv, pf, az, el, di, rng, image_size)
        if "gt_verts" in batch:
            gt = render_np(np.asarray(batch["gt_verts"][i]),
                           np.asarray(batch["gt_faces"][i]), az, el, di, rng,
                           image_size)
            row = np.concatenate([img, pred, gt], axis=1)
        else:
            row = np.concatenate([img, pred], axis=1)
        rows.append(row)
    grid = (np.clip(np.concatenate(rows, axis=0), 0.0, 1.0) * 255).astype(
        np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid).save(path)
    return path
