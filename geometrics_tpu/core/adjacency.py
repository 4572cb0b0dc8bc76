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
    (SURVEY.md §2.1 #8).  Computed with the *face-sum identity* instead of an
    explicit edge list: on a closed manifold each neighbor u of v shares
    exactly two faces with v, so

        Σ_{f∋v} (feats[a_f]+feats[b_f]+feats[c_f]) − facecount(v)·feats[v]
          = 2 · Σ_{u∈N(v)} feats[u],          facecount(v) = deg(v).

    This needs one segment-sum over 3F corner entries (vs 6F directed edges)
    — half the scatter traffic of the naive COO form.  Isolated / padded
    vertices aggregate to 0.

    Args:
      feats: [V, D].
      faces: [F, 3] int32.
      face_mask: [F].
      reduce: "mean" or "sum".

    Returns: [V, D].
    """
    v_max = feats.shape[-2]
    fm = face_mask[:, None]
    face_sum = (jnp.take(feats, faces[:, 0], axis=0)
                + jnp.take(feats, faces[:, 1], axis=0)
                + jnp.take(feats, faces[:, 2], axis=0)) * fm
    corners = faces.reshape(-1)                                  # [3F]
    vals = jnp.repeat(face_sum, 3, axis=0)                       # value per corner
    scat = jax.ops.segment_sum(vals, corners, num_segments=v_max)
    cmask = jnp.repeat(face_mask, 3)
    facecount = jax.ops.segment_sum(cmask, corners, num_segments=v_max)
    nbr_sum2 = scat - facecount[:, None] * feats                 # = 2·Σ neighbors
    if reduce == "sum":
        return 0.5 * nbr_sum2
    return nbr_sum2 / jnp.maximum(2.0 * facecount, 1.0)[:, None]


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


def normalized_adjacency_dense(faces: jax.Array, face_mask: jax.Array,
                               v_max: int) -> jax.Array:
    """Row-normalized dense adjacency [V, V] built on-device (unbatched).

    The MXU-path alternative to segment aggregation: at the framework's
    vertex budgets (V ≤ ~1k) a dense ``Â @ H`` matmul rides the systolic
    array and is built ONCE per topology state (per deformation block),
    amortized over the block's GCN layers — whereas segment-sum scatters per
    layer.  models/gcn.py selects between the two via ``adjacency_mode``.
    """
    src, dst, emask = face_edges(faces, face_mask)
    adj = jnp.zeros((v_max, v_max)).at[src, dst].add(emask)
    adj = jnp.minimum(adj, 1.0)  # collapse the directed-edge multiset
    deg = jnp.sum(adj, axis=1, keepdims=True)
    return adj / jnp.maximum(deg, 1.0)


def normalized_adjacency_dense_batched(faces: jax.Array, face_mask: jax.Array,
                                       v_max: int) -> jax.Array:
    return jax.vmap(lambda f, m: normalized_adjacency_dense(f, m, v_max))(
        faces, face_mask)


def aggregate_neighbors_dense(feats: jax.Array, adj: jax.Array) -> jax.Array:
    """Mean-neighbor aggregation as a batched MXU matmul: [B,V,V]@[B,V,D]."""
    return jnp.einsum("bvu,bud->bvd", adj, feats,
                      preferred_element_type=jnp.float32)


def dense_adjacency(mesh: MeshBuffer) -> jax.Array:
    """Dense normalized adjacency [B, V, V] of a MeshBuffer (test oracle and
    the reference's stored form, SURVEY.md §2.1 #2)."""
    return normalized_adjacency_dense_batched(mesh.faces, mesh.face_mask,
                                              mesh.v_max)
