"""Padded, static-shape batched mesh representation — the core data structure.

The reference (EdwardSmith1884/GEOMetrics, ``utils.py`` — reconstructed per
SURVEY.md §2.1 #2; the mount was empty) represents a mesh as unbatched
``(verts[V,3], faces[F,3], adj[V,V])`` torch tensors whose shapes change every
time adaptive face splitting fires, forcing a per-sample Python loop
(SURVEY.md §3.3 ★).  That design cannot compile to XLA.

The TPU-native design instead fixes upper bounds ``V_max`` / ``F_max`` at trace
time and represents every mesh as *masked slack buffers*:

  * ``verts      [B, V_max, 3]``  float   vertex coordinates (garbage in padded rows)
  * ``faces      [B, F_max, 3]``  int32   vertex indices (0 in padded rows)
  * ``vert_mask  [B, V_max]``     float   1.0 for live vertices
  * ``face_mask  [B, F_max]``     float   1.0 for live faces

Face splitting appends into the slack and flips mask bits; compiled shapes
never change (BASELINE.json north_star: "masked vertex/face-buffer growth with
fixed upper bounds").  Adjacency is *derived on demand* from ``faces`` in COO
form (see adjacency.py) rather than stored as a dense ``V×V`` matrix, because
topology changes on-device during splitting.

All functions here are pure and jit-safe unless suffixed ``_np`` (host-side
helpers for I/O and init-mesh construction).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class MeshBuffer:
    """Batched padded triangle-mesh pytree.

    Invariants (enforced by constructors, relied on everywhere):
      * padded rows of ``faces`` contain index 0 (always a valid slot) so that
        gathers never go out of bounds; their contribution is nulled by
        ``face_mask``;
      * a live face only references live vertices;
      * meshes stay closed 2-manifolds under centroid splitting, which makes
        every directed edge appear exactly twice in the face-derived COO edge
        list (adjacency.py exploits this for exact mean-neighbor aggregation).
    """

    verts: jax.Array      # [B, V, 3] float
    faces: jax.Array      # [B, F, 3] int32
    vert_mask: jax.Array  # [B, V] float (0/1)
    face_mask: jax.Array  # [B, F] float (0/1)

    @property
    def batch_size(self) -> int:
        return self.verts.shape[0]

    @property
    def v_max(self) -> int:
        return self.verts.shape[1]

    @property
    def f_max(self) -> int:
        return self.faces.shape[1]

    @property
    def num_verts(self) -> jax.Array:
        """[B] int32 — live vertex counts."""
        return jnp.sum(self.vert_mask, axis=-1).astype(jnp.int32)

    @property
    def num_faces(self) -> jax.Array:
        """[B] int32 — live face counts."""
        return jnp.sum(self.face_mask, axis=-1).astype(jnp.int32)

    def replace_verts(self, verts: jax.Array) -> "MeshBuffer":
        return self.replace(verts=verts)


def make_mesh_buffer(
    verts: np.ndarray,
    faces: np.ndarray,
    v_max: int,
    f_max: int,
    batch_size: int = 1,
    dtype=jnp.float32,
) -> MeshBuffer:
    """Pad a single host-side mesh into a MeshBuffer replicated over the batch.

    This is how the init sphere (reference: bundled ``.obj`` asset, SURVEY.md
    §2.1 #13) enters the compiled program: same topology for every batch
    element, slack rows zeroed/masked.
    """
    v, f = verts.shape[0], faces.shape[0]
    if v > v_max or f > f_max:
        raise ValueError(f"mesh ({v} verts, {f} faces) exceeds buffer ({v_max}, {f_max})")
    pv = np.zeros((v_max, 3), np.float32)
    pv[:v] = verts
    pf = np.zeros((f_max, 3), np.int32)
    pf[:f] = faces
    vm = np.zeros((v_max,), np.float32)
    vm[:v] = 1.0
    fm = np.zeros((f_max,), np.float32)
    fm[:f] = 1.0
    tile = lambda x: jnp.broadcast_to(jnp.asarray(x), (batch_size,) + x.shape)
    return MeshBuffer(
        verts=tile(pv).astype(dtype),
        faces=tile(pf),
        vert_mask=tile(vm).astype(dtype),
        face_mask=tile(fm).astype(dtype),
    )


# ---------------------------------------------------------------------------
# Host-side mesh construction: icosphere (the init mesh asset)
# ---------------------------------------------------------------------------

def icosahedron_np() -> Tuple[np.ndarray, np.ndarray]:
    """Unit icosahedron (12 verts, 20 faces), CCW winding, radius 1."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int32,
    )
    return verts, faces


def icosphere_np(subdivisions: int = 2, radius: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Subdivided icosahedron projected to a sphere.

    V = 12, 42, 162, 642 for subdivisions 0..3.  The reference initialises
    deformation from a bundled sphere .obj of O(10^2) vertices (SURVEY.md §2.1
    #12/#13); subdivisions=2 (162 verts / 320 faces) matches that scale.
    """
    verts, faces = icosahedron_np()
    for _ in range(subdivisions):
        verts, faces = _subdivide_np(verts, faces)
        verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    return (verts * radius).astype(np.float32), faces


def _subdivide_np(verts: np.ndarray, faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Loop-style 1→4 subdivision with midpoint dedup (host-side only)."""
    verts = list(map(tuple, verts))
    cache = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            a, b = np.array(verts[i]), np.array(verts[j])
            verts.append(tuple((a + b) / 2.0))
            cache[key] = len(verts) - 1
        return cache[key]

    new_faces = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.array(verts, np.float64), np.array(new_faces, np.int32)


# ---------------------------------------------------------------------------
# .obj I/O (reference: load_obj/save_obj-style helpers, SURVEY.md §2.1 #2)
# ---------------------------------------------------------------------------

def load_obj_np(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal wavefront .obj reader: ``v`` and (triangular) ``f`` records.

    Face records may use ``i``, ``i/t``, ``i/t/n`` or ``i//n`` forms; indices
    are 1-based (negative = relative), matching the reference's loader scope.
    Polygonal faces are fan-triangulated.
    """
    verts, faces = [], []
    with open(path, "r") as fh:
        for line in fh:
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def save_obj_np(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")


def save_mesh_buffer_sample(path: str, mesh: MeshBuffer, index: int = 0) -> None:
    """Dump one live (unpadded) sample of a MeshBuffer as .obj (host-side).

    Keeps the reference's qualitative-eyeballing workflow (SURVEY.md §5
    metrics/logging: periodic sample-mesh .obj dumps).
    """
    verts = np.asarray(mesh.verts[index])
    faces = np.asarray(mesh.faces[index])
    vmask = np.asarray(mesh.vert_mask[index]) > 0.5
    fmask = np.asarray(mesh.face_mask[index]) > 0.5
    live_v = np.flatnonzero(vmask)
    remap = -np.ones(verts.shape[0], np.int64)
    remap[live_v] = np.arange(live_v.size)
    live_f = faces[fmask]
    save_obj_np(path, verts[live_v], remap[live_f].astype(np.int32))


# ---------------------------------------------------------------------------
# Basic jit-safe geometry helpers shared across losses/sampling/splitting
# ---------------------------------------------------------------------------

def take_rows(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather along axis -2 with shared leading batch dims:
    arr [..., N, C], idx [..., K] → [..., K, C].

    Indices address whole [C] rows (the channel axis rides as gather offset
    dims) — the TPU DMA fast path.  Never broadcast/repeat indices across the
    trailing dim and gather per element instead: that lowers to a scalar-path
    custom fusion at ~1.6 GB/s (the round-2 perceptual-pooling regression)."""
    if arr.ndim == 2:
        return jnp.take(arr, idx, axis=0)
    return jax.vmap(take_rows)(arr, idx)


def gather_face_verts(verts: jax.Array, faces: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-face corner coordinates.  verts [..., V, 3], faces [..., F, 3] →
    three arrays [..., F, 3]."""
    return (take_rows(verts, faces[..., 0]),
            take_rows(verts, faces[..., 1]),
            take_rows(verts, faces[..., 2]))


def face_normals_areas(
    verts: jax.Array, faces: jax.Array, face_mask: Optional[jax.Array] = None, eps: float = 1e-12
) -> Tuple[jax.Array, jax.Array]:
    """Unit face normals [..., F, 3] and areas [..., F].

    Reference computes areas via the cross product for the area-weighted
    surface sampler (SURVEY.md §3.5); normals additionally drive the curvature
    score for adaptive splitting (§2.1 #5).
    """
    v1, v2, v3 = gather_face_verts(verts, faces)
    n = jnp.cross(v2 - v1, v3 - v1)
    norm = jnp.linalg.norm(n, axis=-1)
    areas = 0.5 * norm
    unit = n / jnp.maximum(norm, eps)[..., None]
    if face_mask is not None:
        areas = areas * face_mask
        unit = unit * face_mask[..., None]
    return unit, areas
