"""Chamfer/F1 vs torch-CPU + numpy oracles; sampling statistics (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geometrics_tpu.core import mesh as M
from geometrics_tpu.core import chamfer as C
from geometrics_tpu.core import sampling as S


def chamfer_np(x, y):
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.standard_normal((17, 3)).astype(np.float32)
    y = rng.standard_normal((23, 3)).astype(np.float32)
    d = np.asarray(C.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, atol=1e-4)


def test_chamfer_matches_torch_oracle(rng):
    import torch

    x = rng.standard_normal((50, 3)).astype(np.float32)
    y = rng.standard_normal((70, 3)).astype(np.float32)
    got = float(C.chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    tx, ty = torch.tensor(x), torch.tensor(y)
    d = torch.cdist(tx, ty) ** 2
    want = float(d.min(1).values.mean() + d.min(0).values.mean())
    assert abs(got - want) < 1e-4


def test_chamfer_masking_invariance(rng):
    x = rng.standard_normal((30, 3)).astype(np.float32)
    y = rng.standard_normal((40, 3)).astype(np.float32)
    want = chamfer_np(x, y)

    xp = np.concatenate([x, 100.0 * np.ones((10, 3), np.float32)])
    yp = np.concatenate([y, -100.0 * np.ones((5, 3), np.float32)])
    xm = np.concatenate([np.ones(30), np.zeros(10)]).astype(np.float32)
    ym = np.concatenate([np.ones(40), np.zeros(5)]).astype(np.float32)
    got = float(
        C.chamfer_distance(jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(xm), jnp.asarray(ym))
    )
    assert abs(got - want) < 1e-4


def test_chamfer_zero_on_identical(rng):
    x = rng.standard_normal((25, 3)).astype(np.float32)
    assert float(C.chamfer_distance(jnp.asarray(x), jnp.asarray(x))) < 1e-6


def test_chamfer_batched(rng):
    x = rng.standard_normal((2, 20, 3)).astype(np.float32)
    y = rng.standard_normal((2, 30, 3)).astype(np.float32)
    got = np.asarray(C.chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    for i in range(2):
        assert abs(got[i] - chamfer_np(x[i], y[i])) < 1e-4


def test_f1_perfect_and_disjoint(rng):
    x = rng.standard_normal((40, 3)).astype(np.float32)
    f1, p, r = C.f1_score(jnp.asarray(x), jnp.asarray(x))
    assert float(f1) == pytest.approx(1.0)
    far = x + 10.0
    f1d, _, _ = C.f1_score(jnp.asarray(x), jnp.asarray(far))
    assert float(f1d) == 0.0


def test_f1_halfway():
    # pred: 2 points, one on a gt point, one far → precision .5, recall .5 (2 gt pts).
    pred = jnp.array([[0, 0, 0], [5, 5, 5]], jnp.float32)
    gt = jnp.array([[0, 0, 0], [9, 9, 9]], jnp.float32)
    f1, p, r = C.f1_score(pred, gt)
    assert float(p) == pytest.approx(0.5)
    assert float(r) == pytest.approx(0.5)
    assert float(f1) == pytest.approx(0.5)


def test_chamfer_gradients(rng):
    x = jnp.asarray(rng.standard_normal((12, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((15, 3)).astype(np.float32))
    g = jax.grad(lambda a: C.chamfer_distance(a, y))(x)
    # Finite-difference check one coordinate.
    eps = 1e-3
    for idx in [(0, 0), (5, 2)]:
        xp = x.at[idx].add(eps)
        xm = x.at[idx].add(-eps)
        fd = (C.chamfer_distance(xp, y) - C.chamfer_distance(xm, y)) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 1e-2


# ----------------------------- sampling ------------------------------------


def test_sample_points_on_surface():
    verts, faces = M.icosphere_np(2)
    key = jax.random.PRNGKey(0)
    pts = S.sample_surface(key, jnp.asarray(verts), jnp.asarray(faces), jnp.ones((len(faces),)), 512)
    r = np.linalg.norm(np.asarray(pts), axis=1)
    # Icosphere surface points lie slightly inside the unit sphere.
    assert r.min() > 0.9 and r.max() < 1.0 + 1e-5


def test_sample_area_weighted():
    # Two faces with area ratio 4:1 → sample frequency ≈ 4:1.
    verts = jnp.array(
        [[0, 0, 0], [2, 0, 0], [0, 2, 0], [10, 0, 0], [11, 0, 0], [10, 1, 0]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    pts = S.sample_surface(jax.random.PRNGKey(1), verts, faces, jnp.ones((2,)), 4000)
    frac_big = float(np.mean(np.asarray(pts)[:, 0] < 5.0))
    assert 0.75 < frac_big < 0.85  # expect 0.8


def test_sample_respects_face_mask():
    verts = jnp.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 0], [11, 10, 0], [10, 11, 0]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    mask = jnp.array([1.0, 0.0])
    pts = np.asarray(S.sample_surface(jax.random.PRNGKey(2), verts, faces, mask, 256))
    assert pts[:, 0].max() < 2.0  # nothing from the masked far face


def test_sampling_gradients_flow_to_verts():
    verts, faces = M.icosphere_np(1)
    gt = jnp.asarray(verts) * 0.5  # shrink target

    def loss(v):
        pts = S.sample_surface(jax.random.PRNGKey(3), v, jnp.asarray(faces), jnp.ones((80,)), 200)
        from geometrics_tpu.core.chamfer import chamfer_distance

        return chamfer_distance(pts, gt)

    g = jax.grad(loss)(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    # Gradient should point outward (shrinking loss by moving verts inward):
    # descent direction -g should have negative radial component on average.
    radial = np.sum(np.asarray(g) * verts, axis=1)
    assert radial.mean() > 0


def test_sample_batched_shapes():
    verts, faces = M.icosphere_np(1)
    mb = M.make_mesh_buffer(verts, faces, v_max=64, f_max=96, batch_size=3)
    pts = S.sample_surface_batched(jax.random.PRNGKey(0), mb.verts, mb.faces, mb.face_mask, 100)
    assert pts.shape == (3, 100, 3)
    # Per-sample keys → batch elements differ.
    assert not np.allclose(np.asarray(pts[0]), np.asarray(pts[1]))


def test_stratified_lower_variance():
    verts, faces = M.icosphere_np(1)
    v, f = jnp.asarray(verts), jnp.asarray(faces)
    fm = jnp.ones((80,))
    gt = S.sample_surface(jax.random.PRNGKey(99), v, f, fm, 2048)
    from geometrics_tpu.core.chamfer import chamfer_distance

    def cham(key, strat):
        pts = S.sample_surface(key, v, f, fm, 256, stratified=strat)
        return float(chamfer_distance(pts, gt))

    keys = [jax.random.PRNGKey(i) for i in range(20)]
    plain = np.var([cham(k, False) for k in keys])
    strat = np.var([cham(k, True) for k in keys])
    assert strat <= plain * 1.5  # stratified no worse (usually much better)
