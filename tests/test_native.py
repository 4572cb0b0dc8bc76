"""Native C++ voxelizer/sampler vs numpy twins (SURVEY.md §2.2 parity)."""

import numpy as np
import pytest

from geometrics_tpu import native
from geometrics_tpu.core.mesh import icosphere_np
from geometrics_tpu.data.synthetic import sample_surface_np, voxelize_solid_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_voxelize_sphere_solid():
    verts, faces = icosphere_np(subdivisions=3, radius=0.8)
    grid = native.voxelize_mesh(verts, faces, res=32)
    assert grid.shape == (32, 32, 32)
    # center cell is inside the sphere, corners are outside
    assert grid[16, 16, 16] == 1.0
    assert grid[0, 0, 0] == 0.0
    # conservative rasterization inflates by ~a half-cell surface shell:
    # expect volume in [ideal, ideal of r+cell]
    vol = grid.mean() * 8.0
    ideal = 4.0 / 3.0 * np.pi * 0.8 ** 3
    inflated = 4.0 / 3.0 * np.pi * (0.8 + 2.0 / 32) ** 3
    assert ideal * 0.95 < vol < inflated * 1.05, vol


def test_voxelize_matches_numpy_twin():
    verts, faces = icosphere_np(subdivisions=3, radius=0.7)
    grid_c = native.voxelize_mesh(verts, faces, res=32)
    rng = np.random.default_rng(0)
    pts, _ = sample_surface_np(rng, verts, faces, 120000)
    grid_np = voxelize_solid_np(pts, res=32)
    # surfaces discretize slightly differently; interiors must agree closely
    agree = (grid_c == grid_np).mean()
    assert agree > 0.97, f"only {agree:.3f} agreement"


def test_native_sample_surface_on_surface():
    verts, faces = icosphere_np(subdivisions=3, radius=0.5)
    pts, nrm = native.sample_surface(verts, faces, 5000, seed=1)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 0.5) < 0.01
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4)
    # normals point radially for a sphere
    cos = np.abs(np.sum(pts / r[:, None] * nrm, axis=1))
    assert cos.mean() > 0.99
