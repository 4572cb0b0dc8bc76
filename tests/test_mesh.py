"""MeshBuffer, icosphere, obj I/O, and geometry-helper tests (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from geometrics_tpu.core import mesh as M


def edge_face_counts(faces):
    """Map undirected edge -> number of adjacent faces (host oracle)."""
    from collections import Counter

    c = Counter()
    for a, b, cc in faces:
        for e in [(a, b), (b, cc), (cc, a)]:
            c[tuple(sorted(e))] += 1
    return c


@pytest.mark.parametrize("sub", [0, 1, 2])
def test_icosphere_closed_manifold(sub):
    verts, faces = M.icosphere_np(sub)
    v, f = len(verts), len(faces)
    e = len(edge_face_counts(faces))
    # Euler characteristic of a sphere: V - E + F = 2.
    assert v - e + f == 2
    # Closed manifold: every edge borders exactly 2 faces.
    assert all(n == 2 for n in edge_face_counts(faces).values())
    # On the unit sphere.
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-5)


def test_icosphere_sizes():
    for sub, (v, f) in enumerate([(12, 20), (42, 80), (162, 320)]):
        verts, faces = M.icosphere_np(sub)
        assert verts.shape == (v, 3) and faces.shape == (f, 3)


def test_obj_roundtrip(tmp_path):
    verts, faces = M.icosphere_np(1)
    p = str(tmp_path / "m.obj")
    M.save_obj_np(p, verts, faces)
    v2, f2 = M.load_obj_np(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_obj_parses_slash_forms(tmp_path):
    p = tmp_path / "s.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\nf 1/1 2/2/2 3//3\nf 1 3 4\n")
    v, f = M.load_obj_np(str(p))
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


def test_mesh_buffer_padding_and_counts():
    verts, faces = M.icosphere_np(1)  # 42 / 80
    mb = M.make_mesh_buffer(verts, faces, v_max=64, f_max=96, batch_size=3)
    assert mb.verts.shape == (3, 64, 3)
    assert mb.faces.shape == (3, 96, 3)
    np.testing.assert_array_equal(np.asarray(mb.num_verts), [42, 42, 42])
    np.testing.assert_array_equal(np.asarray(mb.num_faces), [80, 80, 80])
    # Padded face rows index vertex 0 (in range).
    assert np.all(np.asarray(mb.faces[0, 80:]) == 0)


def test_mesh_buffer_overflow_raises():
    verts, faces = M.icosphere_np(1)
    with pytest.raises(ValueError):
        M.make_mesh_buffer(verts, faces, v_max=10, f_max=96)


def test_face_normals_areas_tetra():
    # Right-corner faces: (0,1,2) in z=0 plane, area 0.5, normal
    # cross((1,0,0),(0,1,0)) = +z; (0,1,3): cross((1,0,0),(0,0,1)) = -y.
    verts = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 1, 3]], jnp.int32)
    n, a = M.face_normals_areas(verts, faces)
    np.testing.assert_allclose(np.asarray(a), [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[1]), [0, -1, 0], atol=1e-6)


def test_face_normals_masked():
    verts = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 0, 0]], jnp.int32)
    mask = jnp.array([1.0, 0.0])
    n, a = M.face_normals_areas(verts, faces, mask)
    assert float(a[1]) == 0.0
    np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 0], atol=1e-6)


def test_sphere_total_area():
    verts, faces = M.icosphere_np(3)
    _, a = M.face_normals_areas(jnp.asarray(verts), jnp.asarray(faces))
    # Icosphere area approaches 4π from below.
    assert 0.97 * 4 * np.pi < float(jnp.sum(a)) < 4 * np.pi


def test_save_mesh_buffer_sample(tmp_path):
    verts, faces = M.icosphere_np(0)
    mb = M.make_mesh_buffer(verts, faces, v_max=20, f_max=30, batch_size=2)
    p = str(tmp_path / "out.obj")
    M.save_mesh_buffer_sample(p, mb, 1)
    v2, f2 = M.load_obj_np(p)
    assert v2.shape == (12, 3) and f2.shape == (20, 3)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
