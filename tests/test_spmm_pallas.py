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
