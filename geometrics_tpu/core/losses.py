"""Geometry regularizers: edge-length and Laplacian terms.

Reference (SURVEY.md §2.1 #6, confirmed present by BASELINE.json configs):
  * edge-length penalty — mean squared edge length, discouraging degenerate
    long edges ("flying vertices");
  * Laplacian smoothness — ``‖v_i − mean(N(v_i))‖²``, plus the *Laplacian
    move* variant used between deformation blocks, penalising the change of
    the umbrella Laplacian before vs after a block (Pixel2Mesh-style, which
    GEOMetrics follows per the paper [P]).

All operate on padded MeshBuffer fields with full masking invariance: padded
vertices/faces contribute exactly zero to sums and to the mean's denominator.

TPU notes: everything is segment-sum / gather based (no dense V×V), fuses into
the surrounding loss graph under jit, and needs no custom kernels — these are
bandwidth-trivial next to Chamfer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .adjacency import aggregate_neighbors_batched, face_edges
from .mesh import take_rows


def edge_lengths_sq(
    verts: jax.Array, faces: jax.Array, face_mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Squared lengths of the face-derived directed-edge multiset (unbatched→batched ok).

    Each undirected edge appears twice per adjacent face pair (4 entries on a
    closed manifold) — uniform multiplicity, so means over the multiset equal
    means over unique edges.  Returns (lengths_sq [..., 6F], mask [..., 6F]).
    """
    src, dst, emask = face_edges(faces, face_mask)
    p = take_rows(verts, src)
    q = take_rows(verts, dst)
    return jnp.sum((p - q) ** 2, axis=-1), emask


def edge_length_loss(verts: jax.Array, faces: jax.Array, face_mask: jax.Array) -> jax.Array:
    """Mean squared edge length per batch element: [B,V,3],[B,F,3],[B,F] → [B]."""
    l2, emask = edge_lengths_sq(verts, faces, face_mask)
    return jnp.sum(l2 * emask, axis=-1) / jnp.maximum(jnp.sum(emask, axis=-1), 1.0)


def umbrella_laplacian(
    verts: jax.Array, faces: jax.Array, face_mask: jax.Array
) -> jax.Array:
    """δ_i = v_i − mean_{j∈N(i)} v_j, batched: [B,V,3]."""
    return verts - aggregate_neighbors_batched(verts, faces, face_mask)


def laplacian_loss(
    verts: jax.Array, faces: jax.Array, face_mask: jax.Array, vert_mask: jax.Array
) -> jax.Array:
    """Mean ‖δ_i‖² over live vertices: → [B]."""
    lap = umbrella_laplacian(verts, faces, face_mask)
    sq = jnp.sum(lap * lap, axis=-1) * vert_mask
    return jnp.sum(sq, axis=-1) / jnp.maximum(jnp.sum(vert_mask, axis=-1), 1.0)


def laplacian_move_loss(
    verts_before: jax.Array,
    verts_after: jax.Array,
    faces: jax.Array,
    face_mask: jax.Array,
    vert_mask: jax.Array,
) -> jax.Array:
    """Mean ‖δ(before)_i − δ(after)_i‖² over live vertices (same topology): → [B].

    The between-block smoothness term: topology (faces/masks) must be the one
    shared by both vertex sets, i.e. apply *before* splitting after a block.
    """
    d = umbrella_laplacian(verts_before, faces, face_mask) - umbrella_laplacian(
        verts_after, faces, face_mask
    )
    sq = jnp.sum(d * d, axis=-1) * vert_mask
    return jnp.sum(sq, axis=-1) / jnp.maximum(jnp.sum(vert_mask, axis=-1), 1.0)


def latent_loss(z_pred: jax.Array, z_gt: jax.Array) -> jax.Array:
    """‖E(pred) − E(gt)‖² mean over latent dims: [B,Z] → [B].

    The GEOMetrics latent loss (SURVEY.md §3.3): both meshes are encoded by
    the *frozen* MeshEncoder; gradients flow only through ``z_pred``.
    """
    diff = z_pred - jax.lax.stop_gradient(z_gt)
    return jnp.mean(diff * diff, axis=-1)
