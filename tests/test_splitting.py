"""Adaptive face splitting: manifold preservation, masking invariance,
capacity gating, curvature scoring (SURVEY.md §4.3 — the #1 bug class)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geometrics_tpu.core.mesh import MeshBuffer, icosphere_np, make_mesh_buffer
from geometrics_tpu.core.splitting import (
    face_curvature_scores,
    split_mesh_buffer,
    split_topk_faces,
)


def _icosphere_buffer(v_max=64, f_max=128, batch=1):
    verts, faces = icosphere_np(subdivisions=0)  # 12 verts, 20 faces
    return make_mesh_buffer(verts, faces, v_max, f_max, batch)


def _directed_edge_counts(faces, face_mask):
    """Each directed edge of a closed manifold must appear exactly twice."""
    from collections import Counter
    cnt = Counter()
    for f, m in zip(np.asarray(faces), np.asarray(face_mask)):
        if m < 0.5:
            continue
        a, b, c = map(int, f)
        for e in [(a, b), (b, a), (b, c), (c, b), (c, a), (a, c)]:
            cnt[e] += 1
    return cnt


def test_split_counts_and_geometry():
    mesh = _icosphere_buffer()
    feats = jnp.zeros((1, 64, 4))
    scores = jnp.arange(128, dtype=jnp.float32)[None] * mesh.face_mask
    new_mesh, new_feats, nsplit = split_mesh_buffer(mesh, feats, scores, 5, 0.0)
    assert int(nsplit[0]) == 5
    assert int(new_mesh.num_verts[0]) == 12 + 5
    assert int(new_mesh.num_faces[0]) == 20 + 10
    # every new vertex is the centroid of a face of the original mesh
    ov = np.asarray(mesh.verts[0])
    of = np.asarray(mesh.faces[0][np.asarray(mesh.face_mask[0]) > 0.5])
    centroids = ov[of].mean(axis=1)
    for vi in range(12, 17):
        nv = np.asarray(new_mesh.verts[0][vi])
        assert np.min(np.linalg.norm(centroids - nv, axis=1)) < 1e-6


def test_split_preserves_closed_manifold():
    mesh = _icosphere_buffer()
    feats = jnp.zeros((1, 64, 4))
    key = jax.random.PRNGKey(0)
    for step in range(3):
        scores = jax.random.uniform(jax.random.fold_in(key, step),
                                    (1, 128)) * mesh.face_mask
        mesh, feats, n = split_mesh_buffer(mesh, feats, scores, 4, 0.0)
    cnt = _directed_edge_counts(mesh.faces[0], mesh.face_mask[0])
    assert all(v == 2 for v in cnt.values()), "directed-edge multiset broken"
    # live faces only reference live vertices
    vmask = np.asarray(mesh.vert_mask[0])
    faces = np.asarray(mesh.faces[0])
    fmask = np.asarray(mesh.face_mask[0]) > 0.5
    assert vmask[faces[fmask]].min() == 1.0


def test_split_threshold_and_capacity():
    mesh = _icosphere_buffer(v_max=14, f_max=64)  # only 2 vertex slots free
    feats = jnp.zeros((1, 14, 4))
    scores = jnp.full((1, 64), 5.0) * mesh.face_mask
    new_mesh, _, nsplit = split_mesh_buffer(mesh, feats, scores, 8, 0.0)
    assert int(nsplit[0]) == 2, "capacity must gate splits"
    assert int(new_mesh.num_verts[0]) == 14

    # threshold above all scores → no splits, buffers bit-identical
    mesh2 = _icosphere_buffer()
    new2, feats2, n2 = split_mesh_buffer(
        mesh2, jnp.zeros((1, 64, 4)), jnp.ones((1, 128)) * mesh2.face_mask,
        4, score_threshold=10.0)
    assert int(n2[0]) == 0
    np.testing.assert_array_equal(np.asarray(new2.verts), np.asarray(mesh2.verts))
    np.testing.assert_array_equal(np.asarray(new2.faces), np.asarray(mesh2.faces))
    np.testing.assert_array_equal(np.asarray(new2.face_mask),
                                  np.asarray(mesh2.face_mask))


def test_split_feature_inheritance():
    mesh = _icosphere_buffer()
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 8))
    feats = feats * mesh.vert_mask[..., None]
    scores = jnp.zeros((1, 128)).at[0, 7].set(9.0)
    new_mesh, new_feats, n = split_mesh_buffer(mesh, feats, scores, 1, 0.0)
    assert int(n[0]) == 1
    f7 = np.asarray(mesh.faces[0, 7])
    expect = np.asarray(feats[0][f7]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(new_feats[0, 12]), expect, atol=1e-6)


def test_split_masking_invariance():
    """Garbage in slack rows must not change the split outcome."""
    mesh = _icosphere_buffer()
    feats = jnp.zeros((1, 64, 4))
    scores = jnp.arange(128, dtype=jnp.float32)[None] * mesh.face_mask

    garbage_verts = mesh.verts + (1.0 - mesh.vert_mask)[..., None] * 77.0
    garbage = MeshBuffer(verts=garbage_verts, faces=mesh.faces,
                         vert_mask=mesh.vert_mask, face_mask=mesh.face_mask)
    a, fa, na = split_mesh_buffer(mesh, feats, scores, 5, 0.0)
    b, fb, nb = split_mesh_buffer(garbage, feats, scores, 5, 0.0)
    live_v = np.asarray(a.vert_mask[0]) > 0.5
    np.testing.assert_allclose(np.asarray(a.verts[0][live_v]),
                               np.asarray(b.verts[0][live_v]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.faces), np.asarray(b.faces))


def test_curvature_scores_sphere_vs_spike():
    """A spiked vertex raises curvature of its incident faces only."""
    verts, faces = icosphere_np(subdivisions=1)  # 42 verts / 80 faces
    mesh = make_mesh_buffer(verts, faces, 64, 160, 1)
    base = face_curvature_scores(mesh.verts[0], mesh.faces[0], mesh.face_mask[0])
    base = np.asarray(base)
    # sphere has uniform-ish low curvature everywhere
    live = np.asarray(mesh.face_mask[0]) > 0.5
    assert base[live].std() < 0.1

    spiked = mesh.verts[0].at[0].mul(2.5)
    sc = np.asarray(face_curvature_scores(spiked, mesh.faces[0],
                                          mesh.face_mask[0]))
    touches0 = np.any(np.asarray(mesh.faces[0]) == 0, axis=1) & live
    assert sc[touches0].min() > base[live].max()
    assert np.all(sc[~live] == 0.0)


def test_split_grad_flows():
    """Centroid creation is differentiable w.r.t. parent vertices."""
    mesh = _icosphere_buffer()
    scores = jnp.zeros((1, 128)).at[0, 3].set(1.0)

    def f(verts):
        m = MeshBuffer(verts=verts, faces=mesh.faces,
                       vert_mask=mesh.vert_mask, face_mask=mesh.face_mask)
        new_mesh, _, _ = split_mesh_buffer(
            m, jnp.zeros((1, 64, 1)), scores, 1, 0.0)
        return jnp.sum(new_mesh.verts[0, 12] ** 2)

    g = jax.grad(f)(mesh.verts)
    f3 = np.asarray(mesh.faces[0, 3])
    assert np.abs(np.asarray(g[0][f3])).sum() > 0
