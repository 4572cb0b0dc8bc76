"""Models: GCN vs dense-adjacency oracle, pooling vs numpy oracle, identity
init, padding invariance, full-model forward (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geometrics_tpu.core.adjacency import dense_adjacency
from geometrics_tpu.core.mesh import MeshBuffer, icosphere_np, make_mesh_buffer
from geometrics_tpu.models import (
    Camera,
    GEOMetricsModel,
    GraphConv,
    ImageEncoder,
    MeshEncoder,
    VoxelDecoder,
    bilinear_sample,
    perceptual_pool,
    project_vertices,
    voxel_bce_loss,
)


@pytest.fixture(scope="module")
def sphere():
    verts, faces = icosphere_np(subdivisions=1)  # 42 / 80
    return make_mesh_buffer(verts, faces, 64, 160, 2)


def test_graphconv_matches_dense_oracle(sphere):
    """W_self·h + W_nbr·(Â h) with the dense normalized adjacency oracle."""
    m = sphere
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 16))
    feats = feats * m.vert_mask[..., None]
    layer = GraphConv(features=8)
    params = layer.init(jax.random.PRNGKey(1), feats, m.faces, m.face_mask,
                        m.vert_mask)["params"]
    out = layer.apply({"params": params}, feats, m.faces, m.face_mask,
                      m.vert_mask)

    adj = dense_adjacency(m)  # [B, V, V] row-normalized
    w_self = np.asarray(params["self_proj"]["kernel"])
    b_self = np.asarray(params["self_proj"]["bias"])
    w_nbr = np.asarray(params["nbr_proj"]["kernel"])
    expect = (np.asarray(feats) @ w_self + b_self
              + np.asarray(adj @ feats) @ w_nbr)
    expect *= np.asarray(m.vert_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_graphconv_padding_invariance(sphere):
    m = sphere
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 16))
    layer = GraphConv(features=8)
    params = layer.init(jax.random.PRNGKey(1), feats, m.faces, m.face_mask,
                        m.vert_mask)["params"]
    clean = feats * m.vert_mask[..., None]
    dirty = feats + (1 - m.vert_mask)[..., None] * 123.0
    a = layer.apply({"params": params}, clean, m.faces, m.face_mask, m.vert_mask)
    b = layer.apply({"params": params}, dirty, m.faces, m.face_mask, m.vert_mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_projection_roundtrip():
    """A vertex straight ahead of the camera projects to the image center."""
    cam = Camera(azimuth=jnp.array([0.3]), elevation=jnp.array([0.4]),
                 distance=jnp.array([2.0]))
    uv, depth = project_vertices(jnp.zeros((1, 1, 3)), cam, image_size=137)
    np.testing.assert_allclose(np.asarray(uv[0, 0]), [68.0, 68.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth[0, 0]), 2.0, atol=1e-5)


def test_bilinear_sample_oracle():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    uv = jnp.asarray([[[2.5, 3.25], [0.0, 0.0], [7.0, 7.0]]])
    out = np.asarray(bilinear_sample(fmap, uv))
    f = np.asarray(fmap[0])
    expect0 = ((f[3, 2] * 0.5 + f[3, 3] * 0.5) * 0.75
               + (f[4, 2] * 0.5 + f[4, 3] * 0.5) * 0.25)
    np.testing.assert_allclose(out[0, 0], expect0, atol=1e-5)
    np.testing.assert_allclose(out[0, 1], f[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 2], f[7, 7], atol=1e-6)


def test_model_identity_at_init(sphere):
    """Zero-initialized delta heads ⇒ untrained forward = init sphere."""
    model = GEOMetricsModel(image_size=32, hidden=16, block_depth=1,
                            carried_dim=8, cnn_widths=(4, 8), num_blocks=2)
    imgs = jnp.zeros((2, 32, 32, 3))
    cam = Camera(azimuth=jnp.zeros(2), elevation=jnp.zeros(2),
                 distance=jnp.full((2,), 2.0))
    params = model.init(jax.random.PRNGKey(0), imgs, cam, sphere)["params"]
    out = model.apply({"params": params}, imgs, cam, sphere)
    np.testing.assert_allclose(np.asarray(out.mesh.verts),
                               np.asarray(sphere.verts), atol=1e-5)
    assert len(out.blocks) == 2


def test_model_with_splitting_runs(sphere):
    model = GEOMetricsModel(image_size=32, hidden=16, block_depth=1,
                            carried_dim=8, cnn_widths=(4, 8), num_blocks=3,
                            splits_per_round=4, split_threshold=-1.0)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    cam = Camera(azimuth=jnp.zeros(2), elevation=jnp.zeros(2),
                 distance=jnp.full((2,), 2.0))
    params = model.init(jax.random.PRNGKey(0), imgs, cam, sphere)["params"]
    out = jax.jit(lambda p, i: model.apply({"params": p}, i, cam, sphere))(
        params, imgs)
    # two split rounds of 4 each (threshold -1 accepts all)
    assert int(out.mesh.num_verts[0]) == 42 + 8
    assert int(out.mesh.num_faces[0]) == 80 + 16


def test_mesh_encoder_padding_invariance(sphere):
    """Latent must not depend on slack-row garbage (latent-loss correctness)."""
    m = sphere
    enc = MeshEncoder(hidden=16, depth=2, latent_dim=8)
    params = enc.init(jax.random.PRNGKey(0), m.verts, m.faces, m.face_mask,
                      m.vert_mask)["params"]
    dirty = m.verts + (1 - m.vert_mask)[..., None] * 55.0
    a = enc.apply({"params": params}, m.verts, m.faces, m.face_mask, m.vert_mask)
    b = enc.apply({"params": params}, dirty, m.faces, m.face_mask, m.vert_mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_voxel_decoder_shapes_and_bce():
    dec = VoxelDecoder(resolution=16, base_channels=16)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    params = dec.init(jax.random.PRNGKey(1), z)["params"]
    logits = dec.apply({"params": params}, z)
    assert logits.shape == (2, 16, 16, 16)
    tgt = (jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 16)) > 0.5
           ).astype(jnp.float32)
    bce = voxel_bce_loss(logits, tgt)
    assert bce.shape == (2,) and np.all(np.isfinite(np.asarray(bce)))
    # oracle check vs explicit -[t log σ + (1-t) log(1-σ)]
    sig = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
    expect = -(np.asarray(tgt) * np.log(sig + 1e-12)
               + (1 - np.asarray(tgt)) * np.log(1 - sig + 1e-12)).mean((1, 2, 3))
    np.testing.assert_allclose(np.asarray(bce), expect, rtol=1e-4)


def test_image_encoder_scales():
    enc = ImageEncoder(widths=(4, 8))
    imgs = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), imgs)["params"]
    maps = enc.apply({"params": params}, imgs)
    assert maps[0].shape == (1, 32, 32, 4)
    assert maps[1].shape == (1, 16, 16, 8)


def test_gathers_lower_to_row_form():
    """Lowering regression (round-2 pooling incident): every gather in the
    pooling/geometry hot paths must address whole trailing-dim ROWS
    (slice_sizes carry the channel dim).  A per-element gather — indices
    broadcast across the trailing dim, slice_sizes all-1 — runs on a TPU
    scalar path at ~1.6 GB/s and once cost 57.9 ms per call (RESULTS.md)."""
    import re

    import jax
    import jax.numpy as jnp

    from geometrics_tpu.core.mesh import gather_face_verts
    from geometrics_tpu.models.perceptual_pooling import bilinear_sample

    def row_gathers_only(txt, trailing):
        sizes = [m.group(1) for m in re.finditer(
            r'"stablehlo.gather".*?slice_sizes = array<i64: ([^>]*)>', txt,
            re.S)]
        assert sizes, "expected at least one gather"
        for s in sizes:
            assert s.split(",")[-1].strip() == str(trailing), (
                f"per-element gather leaked into the lowering: {s}")

    fmap = jnp.zeros((2, 9, 9, 16))
    uv = jnp.zeros((2, 5, 2))
    row_gathers_only(jax.jit(bilinear_sample).lower(fmap, uv).as_text(), 16)

    verts = jnp.zeros((2, 12, 3))
    faces = jnp.zeros((2, 20, 3), jnp.int32)
    row_gathers_only(jax.jit(gather_face_verts).lower(verts, faces).as_text(), 3)
