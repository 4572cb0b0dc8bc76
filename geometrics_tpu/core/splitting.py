"""Adaptive face splitting as masked static-shape buffer growth.

Reference behavior (SURVEY.md §2.1 #5, §3.3 [P]): between deformation blocks,
faces are scored by local curvature (angle between a face's normal and its
edge-neighbors' normals); the top-scoring faces are split 1→3 by inserting the
face centroid as a new vertex (new-vertex features = mean of the parents),
faces/adjacency are rebuilt, and vertex/face counts GROW — dynamic shapes, the
reason the reference loops per sample in Python.

TPU-native re-expression (BASELINE.json north_star): buffers are preallocated
at ``V_max``/``F_max``; a split *appends into slack and flips mask bits*, so
compiled shapes never change.  All selection (top-k), capacity checks, and
scatter indices are computed with static shapes; rejected split slots scatter
into scratch rows that are sliced off, so a rejected split is a provable
no-op (SURVEY.md §4.3 masking invariance).

Split geometry: face (a,b,c) with centroid m becomes (a,b,m) in place plus
appended (b,c,m), (c,a,m) — winding preserved, so closed manifolds stay
closed and the directed-edge-multiset invariant of adjacency.py survives.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .mesh import MeshBuffer, face_normals_areas


def face_curvature_scores(
    verts: jax.Array, faces: jax.Array, face_mask: jax.Array
) -> jax.Array:
    """Per-face curvature score: mean angle (radians) between a face's normal
    and its three edge-adjacent neighbors' normals.  Unbatched: [V,3],[F,3],[F] → [F].

    Edge-neighbor discovery runs fully on-device via sorted edge keys: each
    live face contributes its 3 undirected edge keys; on a closed manifold
    every key appears exactly twice, so after sorting, entries pair up as
    (0,1),(2,3),…  Padded faces get unique sentinel keys that sort to the end
    and never disturb the pairing of live entries.  O(F log F), static shape.
    """
    f_max = faces.shape[0]
    v_max = verts.shape[0]
    normals, _ = face_normals_areas(verts, faces)

    a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
    e0 = jnp.stack([a, b], axis=-1)
    e1 = jnp.stack([b, c], axis=-1)
    e2 = jnp.stack([c, a], axis=-1)
    edges = jnp.concatenate([e0, e1, e2], axis=0)            # [3F, 2]
    if v_max * v_max + 3 * f_max >= 2**31:
        raise ValueError(f"edge keys overflow int32 at v_max={v_max}")
    lo = jnp.minimum(edges[:, 0], edges[:, 1])
    hi = jnp.maximum(edges[:, 0], edges[:, 1])
    keys = lo.astype(jnp.int32) * v_max + hi
    fid = jnp.tile(jnp.arange(f_max, dtype=jnp.int32), 3)
    live = jnp.tile(face_mask > 0.5, 3)
    sentinel = v_max * v_max + jnp.arange(3 * f_max, dtype=jnp.int32)
    keys = jnp.where(live, keys, sentinel)

    order = jnp.argsort(keys)
    sorted_fid = fid[order]
    sorted_live = live[order]
    idx = jnp.arange(3 * f_max)
    partner_fid = sorted_fid[idx ^ 1]                        # pair within (2k, 2k+1)
    partner_live = sorted_live[idx ^ 1]

    cosang = jnp.sum(normals[sorted_fid] * normals[partner_fid], axis=-1)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    w = (sorted_live & partner_live).astype(jnp.float32)
    ang_sum = jax.ops.segment_sum(ang * w, sorted_fid, num_segments=f_max)
    cnt = jax.ops.segment_sum(w, sorted_fid, num_segments=f_max)
    return jnp.where(face_mask > 0.5, ang_sum / jnp.maximum(cnt, 1.0), 0.0)


def face_curvature_scores_batched(
    verts: jax.Array, faces: jax.Array, face_mask: jax.Array
) -> jax.Array:
    return jax.vmap(face_curvature_scores)(verts, faces, face_mask)


class SplitResult(NamedTuple):
    verts: jax.Array
    vert_feats: jax.Array
    faces: jax.Array
    vert_mask: jax.Array
    face_mask: jax.Array
    num_split: jax.Array  # [] int32 — how many splits actually fired


def split_topk_faces(
    verts: jax.Array,        # [V, 3]
    vert_feats: jax.Array,   # [V, D] carried features (pass zeros if unused)
    faces: jax.Array,        # [F, 3] int32
    vert_mask: jax.Array,    # [V]
    face_mask: jax.Array,    # [F]
    scores: jax.Array,       # [F] — higher = split first
    max_splits: int,
    score_threshold: float = 0.0,
) -> SplitResult:
    """Split up to ``max_splits`` top-scoring live faces (unbatched, jit-safe).

    A candidate fires only if (score > threshold) ∧ (the face is live) ∧
    (vertex and face slack remain).  top_k returns scores in descending order
    and threshold acceptance is monotone in score, so accepted candidates form
    a prefix and capacity gating by prefix-count is exact.
    """
    v_max, f_max = verts.shape[0], faces.shape[0]
    num_v = jnp.sum(vert_mask).astype(jnp.int32)
    num_f = jnp.sum(face_mask).astype(jnp.int32)

    masked = jnp.where(face_mask > 0.5, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, max_splits)

    tentative = top_scores > score_threshold
    cap = jnp.minimum(v_max - num_v, (f_max - num_f) // 2)
    prefix = jnp.cumsum(tentative.astype(jnp.int32))
    accept = tentative & (prefix <= cap)
    rank = prefix - 1                                        # 0-based among accepted

    # --- extended buffers: one scratch vertex row, two scratch face rows ----
    verts_ext = jnp.concatenate([verts, jnp.zeros((1, 3), verts.dtype)], axis=0)
    feats_ext = jnp.concatenate(
        [vert_feats, jnp.zeros((1, vert_feats.shape[1]), vert_feats.dtype)], axis=0)
    vmask_ext = jnp.concatenate([vert_mask, jnp.zeros((1,), vert_mask.dtype)])
    faces_ext = jnp.concatenate([faces, jnp.zeros((2, 3), faces.dtype)], axis=0)
    fmask_ext = jnp.concatenate([face_mask, jnp.zeros((2,), face_mask.dtype)])

    fa = faces[top_idx]                                      # [K, 3]
    va, vb, vc = verts[fa[:, 0]], verts[fa[:, 1]], verts[fa[:, 2]]
    centroid = (va + vb + vc) / 3.0
    new_feats = (vert_feats[fa[:, 0]] + vert_feats[fa[:, 1]] + vert_feats[fa[:, 2]]) / 3.0

    new_v_idx = jnp.where(accept, num_v + rank, v_max)       # rejected → scratch row
    verts_ext = verts_ext.at[new_v_idx].set(
        jnp.where(accept[:, None], centroid, 0.0))
    feats_ext = feats_ext.at[new_v_idx].set(
        jnp.where(accept[:, None], new_feats, 0.0))
    vmask_ext = vmask_ext.at[new_v_idx].set(accept.astype(vert_mask.dtype))

    # in-place rewrite of the parent face → (a, b, m); rejected rewrite = identity
    face_abm = jnp.stack([fa[:, 0], fa[:, 1], new_v_idx.astype(faces.dtype)], axis=-1)
    faces_ext = faces_ext.at[top_idx].set(jnp.where(accept[:, None], face_abm, fa))

    # appended faces (b,c,m) and (c,a,m); rejected → scratch rows f_max, f_max+1
    app0 = jnp.where(accept, num_f + 2 * rank, f_max)
    app1 = jnp.where(accept, num_f + 2 * rank + 1, f_max + 1)
    face_bcm = jnp.stack([fa[:, 1], fa[:, 2], new_v_idx.astype(faces.dtype)], axis=-1)
    face_cam = jnp.stack([fa[:, 2], fa[:, 0], new_v_idx.astype(faces.dtype)], axis=-1)
    zero3 = jnp.zeros_like(face_bcm)
    faces_ext = faces_ext.at[app0].set(jnp.where(accept[:, None], face_bcm, zero3))
    faces_ext = faces_ext.at[app1].set(jnp.where(accept[:, None], face_cam, zero3))
    fmask_ext = fmask_ext.at[app0].set(accept.astype(face_mask.dtype))
    fmask_ext = fmask_ext.at[app1].set(accept.astype(face_mask.dtype))

    return SplitResult(
        verts=verts_ext[:v_max],
        vert_feats=feats_ext[:v_max],
        faces=faces_ext[:f_max],
        vert_mask=vmask_ext[:v_max],
        face_mask=fmask_ext[:f_max],
        num_split=jnp.sum(accept.astype(jnp.int32)),
    )


def split_mesh_buffer(
    mesh: MeshBuffer,
    vert_feats: jax.Array,   # [B, V, D]
    scores: jax.Array,       # [B, F]
    max_splits: int,
    score_threshold: float = 0.0,
) -> Tuple[MeshBuffer, jax.Array, jax.Array]:
    """Batched split: returns (new MeshBuffer, new vert_feats, num_split [B])."""
    res = jax.vmap(
        lambda v, ft, f, vm, fm, s: split_topk_faces(
            v, ft, f, vm, fm, s, max_splits, score_threshold)
    )(mesh.verts, vert_feats, mesh.faces, mesh.vert_mask, mesh.face_mask, scores)
    new_mesh = MeshBuffer(
        verts=res.verts, faces=res.faces,
        vert_mask=res.vert_mask, face_mask=res.face_mask)
    return new_mesh, res.vert_feats, res.num_split
