"""Graph adjacency aggregation for GCN layers, derived on-device from faces.

Reference design (reconstructed, SURVEY.md §2.1 #2/#8): build a dense
normalized adjacency matrix ``Â [V,V]`` from faces once per mesh on the host,
then every GCN layer computes ``Â @ H`` as a dense matmul.  That is wasteful
(Â is ~6/V dense) and impossible here anyway: adaptive splitting changes
topology *on-device*, so adjacency must be recomputed inside the compiled
program.

TPU-native design: adjacency lives implicitly in the face list.  Each live
face (a,b,c) contributes the six directed edges (a,b),(b,a),(b,c),(c,b),
(c,a),(a,c).  For a **closed 2-manifold** — which the icosphere is, and which
centroid face-splitting preserves — every undirected edge borders exactly two
faces, so every directed edge appears exactly **twice** in this multiset.
Mean-neighbor aggregation over the multiset therefore equals exact
mean-neighbor aggregation over the true (deduplicated) neighbor set:

    sum_multiset(h_j) / count_multiset = (2 · sum_unique h_j) / (2 · deg) .

This lets us skip on-device edge dedup entirely.  Aggregation is a
``segment_sum`` (scatter-add) over at most ``6·F_max`` edges — see
ops/spmm_pallas.py for the Pallas kernel variant; this module is the
``jax.lax``-only reference implementation (SURVEY.md §4.2 demands both).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .mesh import MeshBuffer


def face_edges(faces: jax.Array, face_mask: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Directed COO edge list from a padded face buffer.

    Args:
      faces: [F, 3] int32 (padded rows contain 0s).
      face_mask: [F] float 0/1.

    Returns:
      src [6F] int32, dst [6F] int32, edge_mask [6F] float.
      Padded faces yield edges (0,0) with mask 0, contributing nothing.
    """
    a, b, c = faces[..., 0], faces[..., 1], faces[..., 2]
    src = jnp.concatenate([a, b, b, c, c, a], axis=-1)
    dst = jnp.concatenate([b, a, c, b, a, c], axis=-1)
    emask = jnp.concatenate([face_mask] * 6, axis=-1)
    return src, dst, emask


def aggregate_neighbors(
    feats: jax.Array,
    faces: jax.Array,
    face_mask: jax.Array,
    *,
    reduce: str = "mean",
) -> jax.Array:
    """Neighbor aggregation ``agg[i] = reduce_{j ∈ N(i)} feats[j]`` (unbatched).

    Equivalent to the reference's ``Â @ H`` with row-normalized adjacency
    (SURVEY.md §2.1 #8) but computed as a masked segment-sum over the
    face-derived directed-edge multiset.  Exact for closed manifolds (see
    module docstring).  Isolated / padded vertices aggregate to 0.

    Args:
      feats: [V, D].
      faces: [F, 3] int32.
      face_mask: [F].
      reduce: "mean" or "sum".

    Returns: [V, D].
    """
    v_max = feats.shape[-2]
    src, dst, emask = face_edges(faces, face_mask)
    vals = jnp.take(feats, dst, axis=0) * emask[:, None]
    sums = jax.ops.segment_sum(vals, src, num_segments=v_max)
    if reduce == "sum":
        # Multiset double-counts each neighbor on closed manifolds; halve.
        return 0.5 * sums
    counts = jax.ops.segment_sum(emask, src, num_segments=v_max)
    return sums / jnp.maximum(counts, 1.0)[:, None]


def aggregate_neighbors_batched(
    feats: jax.Array, faces: jax.Array, face_mask: jax.Array, *, reduce: str = "mean"
) -> jax.Array:
    """vmapped :func:`aggregate_neighbors` over a leading batch axis."""
    return jax.vmap(lambda f, fa, fm: aggregate_neighbors(f, fa, fm, reduce=reduce))(
        feats, faces, face_mask
    )


def vertex_degrees(faces: jax.Array, face_mask: jax.Array, v_max: int) -> jax.Array:
    """True vertex degrees [V] (multiset count / 2) for a closed manifold."""
    src, _, emask = face_edges(faces, face_mask)
    return 0.5 * jax.ops.segment_sum(emask, src, num_segments=v_max)


def dense_adjacency(mesh: MeshBuffer) -> jax.Array:
    """Materialize the dense normalized adjacency [B, V, V] (test oracle only).

    This is what the reference stores (SURVEY.md §2.1 #2); in this framework it
    exists solely so tests can check segment aggregation against ``Â @ H``.
    """
    def one(faces, face_mask, v_max):
        src, dst, emask = face_edges(faces, face_mask)
        adj = jnp.zeros((v_max, v_max)).at[src, dst].add(emask)
        adj = jnp.minimum(adj, 1.0)  # collapse the directed-edge multiset
        deg = jnp.sum(adj, axis=1, keepdims=True)
        return adj / jnp.maximum(deg, 1.0)

    v_max = mesh.v_max
    return jax.vmap(lambda f, m: one(f, m, v_max))(mesh.faces, mesh.face_mask)
