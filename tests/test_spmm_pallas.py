"""Fused SpMM kernel vs lax oracle (SURVEY.md §4.2 kernel-equivalence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geometrics_tpu.core.adjacency import (
    aggregate_neighbors_batched,
    normalized_adjacency_dense_batched,
)
from geometrics_tpu.core.mesh import icosphere_np, make_mesh_buffer
from geometrics_tpu.ops.spmm_pallas import (
    adjacency_counts_dense,
    spmm_mean_batched,
    spmm_mean_pallas,
)


@pytest.fixture(scope="module")
def mesh():
    verts, faces = icosphere_np(2)  # 162 verts / 320 faces
    return make_mesh_buffer(verts, faces, 200, 400, 2)


def test_spmm_matches_segment_aggregation(mesh):
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 200, 48))
    feats = feats * mesh.vert_mask[..., None]
    counts = jax.vmap(lambda f, m: adjacency_counts_dense(f, m, 200))(
        mesh.faces, mesh.face_mask)
    got = spmm_mean_batched(counts, feats)
    want = aggregate_neighbors_batched(feats, mesh.faces, mesh.face_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spmm_grad_matches_oracle(mesh):
    """Custom VJP (transposed kernel launch) vs lax-oracle gradients."""
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 200, 48))
    counts = jax.vmap(lambda f, m: adjacency_counts_dense(f, m, 200))(
        mesh.faces, mesh.face_mask)
    cot = jax.random.normal(jax.random.PRNGKey(2), (2, 200, 48))

    def loss_pallas(x):
        return jnp.sum(spmm_mean_batched(counts, x) * cot)

    def loss_lax(x):
        return jnp.sum(
            aggregate_neighbors_batched(x, mesh.faces, mesh.face_mask) * cot)

    g_pallas = jax.grad(loss_pallas)(feats)
    g_lax = jax.grad(loss_lax)(feats)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_lax),
                               rtol=1e-5, atol=1e-5)


def test_gcn_block_pallas_mode_matches_segment(mesh):
    """adjacency_mode='pallas' is a wired model path (VERDICT round-1 Weak
    #4): same params → same outputs and finite grads as 'segment'."""
    from geometrics_tpu.models.gcn import GCNDeformationBlock

    coords = mesh.verts
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 200, 16))
    pooled = pooled * mesh.vert_mask[..., None]

    def run(mode, params=None):
        block = GCNDeformationBlock(hidden=32, depth=2, out_features=8,
                                    adjacency_mode=mode)
        if params is None:
            params = block.init(jax.random.PRNGKey(0), coords, pooled, None,
                                mesh.faces, mesh.face_mask, mesh.vert_mask)
        out = block.apply(params, coords, pooled, None, mesh.faces,
                          mesh.face_mask, mesh.vert_mask)
        return params, out

    params, (d_seg, f_seg) = run("segment")
    _, (d_pal, f_pal) = run("pallas", params)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_seg),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_seg),
                               rtol=1e-4, atol=1e-4)

    def loss(p):
        block = GCNDeformationBlock(hidden=32, depth=2, out_features=8,
                                    adjacency_mode="pallas")
        d, f = block.apply(p, coords, pooled, None, mesh.faces,
                           mesh.face_mask, mesh.vert_mask)
        return jnp.sum(d ** 2) + jnp.sum(f ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_spmm_unpadded_sizes():
    """Non-multiple-of-128 V and D exercise the padding path."""
    r = np.random.default_rng(1)
    v, d = 67, 19
    counts = jnp.asarray((r.random((v, v)) > 0.8).astype(np.float32) * 2.0)
    counts = counts * (1 - jnp.eye(v))
    feats = jnp.asarray(r.normal(size=(v, d)).astype(np.float32))
    got = spmm_mean_pallas(counts, feats)
    a = np.minimum(np.asarray(counts), 1.0)
    deg = a.sum(1, keepdims=True)
    want = (a @ np.asarray(feats)) / np.maximum(deg, 1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
