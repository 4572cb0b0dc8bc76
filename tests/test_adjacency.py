"""Adjacency aggregation vs dense-Â oracle + masking invariance (SURVEY.md §4.1/§4.3)."""

import numpy as np
import jax
import jax.numpy as jnp

from geometrics_tpu.core import mesh as M
from geometrics_tpu.core import adjacency as A


def dense_mean_agg_np(feats, faces, v):
    """Host oracle: true mean over deduplicated neighbor sets."""
    nbrs = [set() for _ in range(v)]
    for a, b, c in faces:
        nbrs[a] |= {b, c}
        nbrs[b] |= {a, c}
        nbrs[c] |= {a, b}
    out = np.zeros_like(feats)
    for i in range(v):
        if nbrs[i]:
            out[i] = feats[list(nbrs[i])].mean(axis=0)
    return out


def test_aggregate_matches_dense_oracle(rng):
    verts, faces = M.icosphere_np(1)  # closed manifold → multiset trick exact
    v = len(verts)
    feats = rng.standard_normal((v, 8)).astype(np.float32)
    face_mask = jnp.ones((len(faces),))
    got = A.aggregate_neighbors(jnp.asarray(feats), jnp.asarray(faces), face_mask)
    want = dense_mean_agg_np(feats, faces, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_aggregate_sum_halves_multiset(rng):
    verts, faces = M.icosphere_np(0)
    v = len(verts)
    feats = rng.standard_normal((v, 4)).astype(np.float32)
    face_mask = jnp.ones((len(faces),))
    got = A.aggregate_neighbors(jnp.asarray(feats), jnp.asarray(faces), face_mask, reduce="sum")
    # Oracle: plain sum over unique neighbors.
    nbrs = [set() for _ in range(v)]
    for a, b, c in faces:
        nbrs[a] |= {b, c}
        nbrs[b] |= {a, c}
        nbrs[c] |= {a, b}
    want = np.stack([feats[list(n)].sum(0) for n in nbrs])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_masking_invariance(rng):
    """Padded buffers with garbage in masked slots == unpadded computation."""
    verts, faces = M.icosphere_np(1)
    v, f = len(verts), len(faces)
    feats = rng.standard_normal((v, 6)).astype(np.float32)

    unpadded = A.aggregate_neighbors(jnp.asarray(feats), jnp.asarray(faces), jnp.ones((f,)))

    v_max, f_max = v + 17, f + 23
    feats_p = np.concatenate([feats, rng.standard_normal((17, 6)).astype(np.float32) * 100])
    faces_garbage = rng.integers(0, v_max, (23, 3)).astype(np.int32)
    faces_p = np.concatenate([faces, faces_garbage])
    fmask = np.concatenate([np.ones(f), np.zeros(23)]).astype(np.float32)

    padded = A.aggregate_neighbors(jnp.asarray(feats_p), jnp.asarray(faces_p), jnp.asarray(fmask))
    np.testing.assert_allclose(np.asarray(padded[:v]), np.asarray(unpadded), atol=1e-5)


def test_batched_matches_unbatched(rng):
    verts, faces = M.icosphere_np(1)
    mb = M.make_mesh_buffer(verts, faces, v_max=64, f_max=96, batch_size=2)
    feats = jnp.asarray(rng.standard_normal((2, 64, 5)).astype(np.float32))
    batched = A.aggregate_neighbors_batched(feats, mb.faces, mb.face_mask)
    for i in range(2):
        single = A.aggregate_neighbors(feats[i], mb.faces[i], mb.face_mask[i])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), atol=1e-6)


def test_dense_adjacency_rows_normalized():
    verts, faces = M.icosphere_np(1)
    mb = M.make_mesh_buffer(verts, faces, v_max=50, f_max=90, batch_size=1)
    adj = np.asarray(A.dense_adjacency(mb))[0]
    rows = adj[:42].sum(axis=1)
    np.testing.assert_allclose(rows, 1.0, atol=1e-5)
    # Â @ H equals segment aggregation.
    feats = np.random.default_rng(1).standard_normal((50, 4)).astype(np.float32)
    seg = A.aggregate_neighbors(jnp.asarray(feats), mb.faces[0], mb.face_mask[0])
    np.testing.assert_allclose(adj @ feats, np.asarray(seg), atol=1e-5)


def test_vertex_degrees_icosahedron():
    verts, faces = M.icosphere_np(0)
    deg = A.vertex_degrees(jnp.asarray(faces), jnp.ones((len(faces),)), len(verts))
    np.testing.assert_allclose(np.asarray(deg), 5.0)  # icosahedron: all degree 5


def test_aggregation_jits_and_grads(rng):
    verts, faces = M.icosphere_np(1)
    feats = jnp.asarray(rng.standard_normal((42, 4)).astype(np.float32))
    fm = jnp.ones((80,))

    @jax.jit
    def loss(h):
        return jnp.sum(A.aggregate_neighbors(h, jnp.asarray(faces), fm) ** 2)

    g = jax.grad(loss)(feats)
    assert g.shape == feats.shape
    assert np.isfinite(np.asarray(g)).all()


def test_dense_mode_matches_segment_mode():
    """GraphConv with precomputed dense Â must equal the segment path."""
    import jax
    import jax.numpy as jnp
    from geometrics_tpu.core.adjacency import (
        aggregate_neighbors_batched, aggregate_neighbors_dense,
        normalized_adjacency_dense_batched)
    from geometrics_tpu.core.mesh import icosphere_np, make_mesh_buffer

    verts, faces = icosphere_np(1)
    m = make_mesh_buffer(verts, faces, 64, 160, 2)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 16))
    feats = feats * m.vert_mask[..., None]
    seg = aggregate_neighbors_batched(feats, m.faces, m.face_mask)
    adj = normalized_adjacency_dense_batched(m.faces, m.face_mask, 64)
    den = aggregate_neighbors_dense(feats, adj)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(den),
                               rtol=1e-5, atol=1e-5)


def test_dense_mode_model_forward_matches():
    """Whole deformation block agrees between adjacency modes."""
    import jax
    import jax.numpy as jnp
    from geometrics_tpu.core.mesh import icosphere_np, make_mesh_buffer
    from geometrics_tpu.models.gcn import GCNDeformationBlock

    verts, faces = icosphere_np(1)
    m = make_mesh_buffer(verts, faces, 64, 160, 2)
    pooled = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 8))
    pooled = pooled * m.vert_mask[..., None]
    kw = dict(hidden=16, depth=2, out_features=8)
    blk_s = GCNDeformationBlock(adjacency_mode="segment", **kw)
    blk_d = GCNDeformationBlock(adjacency_mode="dense", **kw)
    params = blk_s.init(jax.random.PRNGKey(1), m.verts, pooled, None,
                        m.faces, m.face_mask, m.vert_mask)["params"]
    d_s, f_s = blk_s.apply({"params": params}, m.verts, pooled, None,
                           m.faces, m.face_mask, m.vert_mask)
    d_d, f_d = blk_d.apply({"params": params}, m.verts, pooled, None,
                           m.faces, m.face_mask, m.vert_mask)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_d),
                               rtol=1e-4, atol=1e-4)
