"""Synthetic ShapeNet-style dataset: parametric shapes + renders + GT targets.

The reference's data layer (SURVEY.md §2.1 #1, §3.1) downloads 3D-R2N2
ShapeNet renders + CAD meshes and preprocesses each model into
``(RGB render 137×137 + camera pose, GT mesh graph, GT surface points,
32³ voxel grid)``.  This environment has zero network egress (SURVEY.md §0),
so this module generates a *synthetic* dataset with the exact same per-sample
contract, so every training/eval config runs end-to-end:

  * 13 parametric shape "classes" (superquadric-style deformations of an
    icosphere — axis scales, box exponents, radial bumps, pinches, tapers)
    standing in for the 13 ShapeNet categories [B:11];
  * renders produced by a z-buffered point-splat rasterizer with Lambertian
    shading, using the SAME camera convention as
    models/perceptual_pooling.py — so perceptual pooling sees geometrically
    consistent images;
  * GT surface point clouds (area-weighted, numpy twin of core/sampling.py);
  * solid 32³ occupancy voxel grids (surface fill + outside flood-fill —
    the numpy twin of what the reference gets from the ``binvox`` subprocess;
    a faster C++ voxelizer lives in native/, used when built).

Everything is deterministic in (class_id, model_id, seed).  When a real
preprocessed ShapeNet tree exists, data/shapenet.py loads it with the same
sample dict schema.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..core.mesh import icosphere_np

IMAGE_SIZE = 137
VOXEL_RES = 32
FOV_DEG = 49.134  # keep in sync with models/perceptual_pooling.py


# ---------------------------------------------------------------------------
# Parametric shape families (13 "classes")
# ---------------------------------------------------------------------------

CLASS_NAMES = [
    "ellipsoid", "box", "tube", "bowl", "bump_low", "bump_high", "pinch",
    "taper", "wedge", "capsule", "star", "twist", "flat",
]


def _superquadric_radius(d: np.ndarray, e: float) -> np.ndarray:
    """Radial scale for direction d on a superquadric-ish unit shape."""
    p = 2.0 / max(e, 1e-3)
    return (np.abs(d[:, 0]) ** p + np.abs(d[:, 1]) ** p + np.abs(d[:, 2]) ** p) ** (
        -1.0 / p
    )


def generate_shape(class_id: int, model_id: int, seed: int = 0,
                   subdivisions: int = 3, norm_radius: float = 0.5
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic (verts [V,3] f32, faces [F,3] i32) for one sample.

    All shapes share icosphere topology (V=642, F=1280 at subdivisions=3) so
    GT mesh graphs have a uniform static shape for the AE/latent path —
    mirroring how the reference's GT graphs come from simplified CAD meshes.
    """
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, class_id, model_id]))
    verts, faces = icosphere_np(subdivisions=subdivisions, radius=1.0)
    v = verts.astype(np.float64)
    d = v / np.linalg.norm(v, axis=1, keepdims=True)

    name = CLASS_NAMES[class_id % len(CLASS_NAMES)]
    scales = rng.uniform(0.55, 1.0, size=3)

    if name == "ellipsoid":
        r = np.ones(len(v))
    elif name == "box":
        r = _superquadric_radius(d, rng.uniform(0.25, 0.5))
    elif name == "tube":
        scales = np.array([rng.uniform(0.3, 0.45), 1.0, rng.uniform(0.3, 0.45)])
        r = _superquadric_radius(d, rng.uniform(0.4, 0.9))
    elif name == "bowl":
        r = 1.0 - 0.45 * np.clip(d[:, 1], 0, 1) ** 2
    elif name in ("bump_low", "bump_high"):
        freq = 2.0 if name == "bump_low" else 4.0
        amp = rng.uniform(0.08, 0.18)
        r = 1.0 + amp * np.sin(freq * math.pi * d[:, 0]) * np.sin(
            freq * math.pi * d[:, 1]) * np.cos(freq * math.pi * d[:, 2])
    elif name == "pinch":
        r = 1.0 - rng.uniform(0.3, 0.5) * np.exp(-8.0 * d[:, 1] ** 2)
    elif name == "taper":
        r = 1.0 - rng.uniform(0.25, 0.45) * (d[:, 1] + 1.0) / 2.0
    elif name == "wedge":
        r = _superquadric_radius(d, 0.35)
        scales = np.array([1.0, rng.uniform(0.35, 0.55), rng.uniform(0.6, 0.9)])
        r = r * (1.0 - 0.3 * np.clip(d[:, 0], 0, 1))
    elif name == "capsule":
        scales = np.array([rng.uniform(0.35, 0.5), 1.0, rng.uniform(0.35, 0.5)])
        r = np.ones(len(v))
    elif name == "star":
        r = 1.0 + rng.uniform(0.15, 0.3) * np.cos(5.0 * np.arctan2(d[:, 2], d[:, 0])) * (
            1.0 - d[:, 1] ** 2)
    elif name == "twist":
        ang = rng.uniform(0.6, 1.2) * v[:, 1]
        ca, sa = np.cos(ang), np.sin(ang)
        v = np.stack([ca * v[:, 0] - sa * v[:, 2], v[:, 1],
                      sa * v[:, 0] + ca * v[:, 2]], axis=1)
        r = _superquadric_radius(d, rng.uniform(0.4, 0.8))
    else:  # flat
        scales = np.array([1.0, rng.uniform(0.15, 0.3), 1.0])
        r = _superquadric_radius(d, rng.uniform(0.5, 1.0))

    v = v * r[:, None] * scales[None, :]
    # ShapeNet convention (SURVEY.md §3.4): unit-diameter normalization
    # (norm_radius=0.5) so the paper's τ=1e-4 F1 threshold applies directly;
    # pass norm_radius=0.9 to reproduce round-1 datasets (legacy scale).
    v *= norm_radius / max(np.linalg.norm(v, axis=1).max(), 1e-9)
    return v.astype(np.float32), faces


# ---------------------------------------------------------------------------
# numpy geometry twins (GT generation must not depend on jax)
# ---------------------------------------------------------------------------

def sample_surface_np(rng: np.random.Generator, verts: np.ndarray,
                      faces: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Area-weighted surface samples (points [n,3], unit normals [n,3])."""
    v1, v2, v3 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    cross = np.cross(v2 - v1, v3 - v1)
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    # degenerate input (e.g. an untrained prediction collapsed to a point)
    # falls back to uniform face sampling instead of 0/0
    prob = area / total if total > 1e-12 else np.full(len(area), 1.0 / len(area))
    idx = rng.choice(len(faces), size=n, p=prob)
    r1, r2 = rng.random(n), rng.random(n)
    s = np.sqrt(r1)[:, None]
    pts = (1 - s) * v1[idx] + s * (1 - r2[:, None]) * v2[idx] + s * r2[:, None] * v3[idx]
    nrm = cross[idx] / np.maximum(np.linalg.norm(cross[idx], axis=1, keepdims=True), 1e-12)
    return pts.astype(np.float32), nrm.astype(np.float32)


def voxelize_solid_np(pts: np.ndarray, res: int = VOXEL_RES,
                      lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """Solid occupancy grid from a dense surface sample (binvox stand-in).

    Surface cells are marked, then empty space reachable from the border is
    flood-filled (6-connected dilation to fixpoint); everything else is solid.
    native/voxelizer.cpp implements the same algorithm from triangles.
    """
    cell = (np.clip((pts - lo) / (hi - lo), 0, 1 - 1e-6) * res).astype(np.int64)
    surf = np.zeros((res, res, res), bool)
    surf[cell[:, 0], cell[:, 1], cell[:, 2]] = True

    empty = ~surf
    outside = np.zeros_like(surf)
    outside[0, :, :] = empty[0, :, :]
    outside[-1, :, :] |= empty[-1, :, :]
    outside[:, 0, :] |= empty[:, 0, :]
    outside[:, -1, :] |= empty[:, -1, :]
    outside[:, :, 0] |= empty[:, :, 0]
    outside[:, :, -1] |= empty[:, :, -1]
    while True:
        grown = outside.copy()
        grown[1:, :, :] |= outside[:-1, :, :]
        grown[:-1, :, :] |= outside[1:, :, :]
        grown[:, 1:, :] |= outside[:, :-1, :]
        grown[:, :-1, :] |= outside[:, 1:, :]
        grown[:, :, 1:] |= outside[:, :, :-1]
        grown[:, :, :-1] |= outside[:, :, 1:]
        grown &= empty
        if (grown == outside).all():
            break
        outside = grown
    return (~outside).astype(np.float32)


def _camera_matrix_np(azimuth: float, elevation: float, distance: float):
    """numpy twin of models/perceptual_pooling.camera_rotation (one camera)."""
    caz, saz = math.cos(azimuth), math.sin(azimuth)
    cel, sel = math.cos(elevation), math.sin(elevation)
    pos = distance * np.array([cel * caz, sel, cel * saz])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd])  # rows
    return rot, pos


def render_np(verts: np.ndarray, faces: np.ndarray, azimuth: float,
              elevation: float, distance: float, rng: np.random.Generator,
              image_size: int = IMAGE_SIZE, n_splat: int = 60000) -> np.ndarray:
    """Z-buffered point-splat render with Lambertian shading → [H,W,3] in [0,1].

    Stand-in for the reference's pre-rendered 3D-R2N2 images; uses the same
    projection convention as perceptual pooling so projected vertices land on
    the shape in the image.
    """
    pts, nrm = sample_surface_np(rng, verts, faces, n_splat)
    rot, pos = _camera_matrix_np(azimuth, elevation, distance)
    p_cam = (pts - pos) @ rot.T
    z = p_cam[:, 2]
    focal = (image_size / 2.0) / math.tan(math.radians(FOV_DEG) / 2.0)
    c = (image_size - 1) / 2.0
    u = np.round(focal * p_cam[:, 0] / np.maximum(z, 1e-4) + c).astype(np.int64)
    v = np.round(focal * p_cam[:, 1] / np.maximum(z, 1e-4) + c).astype(np.int64)
    ok = (z > 1e-4) & (u >= 0) & (u < image_size) & (v >= 0) & (v < image_size)
    u, v, z = u[ok], v[ok], z[ok]
    nrm = nrm[ok]

    pix = v * image_size + u
    order = np.lexsort((z, pix))          # by pixel, nearest first
    pix_s = pix[order]
    first = np.ones(len(pix_s), bool)
    first[1:] = pix_s[1:] != pix_s[:-1]
    win = order[first]

    light = np.array([0.4, 0.8, 0.45])
    light /= np.linalg.norm(light)
    shade = 0.25 + 0.75 * np.abs(nrm[win] @ light)
    base = np.array([0.55, 0.6, 0.7])

    img = np.ones((image_size * image_size, 3), np.float32)  # white background
    img[pix[win]] = shade[:, None] * base[None, :]
    return img.reshape(image_size, image_size, 3)


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

@dataclass
class SyntheticConfig:
    num_classes: int = 13
    models_per_class: int = 32
    views_per_model: int = 1   # 3D-R2N2 renders 24 views per model; >1 makes
                               # the index space models×views with per-view
                               # cameras (shape/points/voxels shared per model)
    gt_points: int = 4096
    image_size: int = IMAGE_SIZE
    voxel_res: int = VOXEL_RES
    seed: int = 0
    subdivisions: int = 3
    render: bool = True
    voxels: bool = True
    norm_radius: float = 0.5   # unit-diameter ShapeNet normalization; 0.9
                               # reproduces round-1 legacy-scale datasets
    camera_distance: Optional[float] = None  # None → scaled with norm_radius
                                             # to keep image coverage constant

    @property
    def distance(self) -> float:
        return (self.camera_distance if self.camera_distance is not None
                else 2.2 * self.norm_radius / 0.9)

    @property
    def vox_extent(self) -> float:
        """Voxel-grid half-extent, proportional to the shape scale (the
        legacy ±1.0 grid held radius-0.9 shapes; keep the same margin)."""
        return self.norm_radius / 0.9


class SyntheticShapeDataset:
    """Map-style dataset; ``get(i)`` builds one sample deterministically.

    Sample schema (shared with data/shapenet.py):
      image [H,W,3] f32, azimuth/elevation/distance f32 scalars,
      gt_points [P,3] f32, gt_verts [V,3] f32, gt_faces [F,3] i32,
      voxels [R,R,R] f32, class_id i32, model_id i32.
    """

    def __init__(self, config: SyntheticConfig = SyntheticConfig()):
        self.config = config

    @property
    def diameter(self) -> float:
        """Shape-normalization diameter (eval threshold matching)."""
        return 2.0 * self.config.norm_radius

    def __len__(self) -> int:
        return (self.config.num_classes * self.config.models_per_class
                * self.config.views_per_model)

    def class_of(self, index: int) -> int:
        per_class = self.config.models_per_class * self.config.views_per_model
        return index // per_class

    def get(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.config
        class_id = self.class_of(index)
        within = index % (cfg.models_per_class * cfg.views_per_model)
        model_id = within // cfg.views_per_model
        view_id = within % cfg.views_per_model
        rng = np.random.default_rng(np.random.SeedSequence(
            [cfg.seed, 1000 + class_id, model_id, view_id]))
        verts, faces = generate_shape(class_id, model_id, cfg.seed,
                                      cfg.subdivisions, cfg.norm_radius)
        azimuth = rng.uniform(0.0, 2.0 * math.pi)
        elevation = rng.uniform(math.radians(20.0), math.radians(35.0))
        distance = cfg.distance
        sample: Dict[str, np.ndarray] = {
            "gt_verts": verts,
            "gt_faces": faces,
            "azimuth": np.float32(azimuth),
            "elevation": np.float32(elevation),
            "distance": np.float32(distance),
            "class_id": np.int32(class_id),
            "model_id": np.int32(model_id),
        }
        pts, _ = sample_surface_np(rng, verts, faces, cfg.gt_points)
        sample["gt_points"] = pts
        if cfg.render:
            sample["image"] = render_np(
                verts, faces, azimuth, elevation, distance, rng,
                cfg.image_size)
        if cfg.voxels:
            sample["voxels"] = self._voxelize(rng, verts, faces, cfg.voxel_res,
                                              cfg.vox_extent)
        return sample

    @staticmethod
    def _voxelize(rng, verts, faces, res, extent: float = 1.0) -> np.ndarray:
        """Native C++ voxelizer when built (binvox stand-in), numpy twin else."""
        try:
            from .. import native

            if native.available():
                return native.voxelize_mesh(verts, faces, res,
                                            lo=-extent, hi=extent)
        except Exception:
            pass
        dense, _ = sample_surface_np(rng, verts, faces, 120000)
        return voxelize_solid_np(dense, res, lo=-extent, hi=extent)
