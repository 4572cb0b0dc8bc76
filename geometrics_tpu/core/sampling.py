"""Differentiable area-weighted surface sampling, jit-native.

Reference micro-stack (SURVEY.md §3.5, reconstructed from ``utils.py``):

    areas  = ‖(v2−v1)×(v3−v1)‖/2
    idx    ~ torch.multinomial(areas / Σareas, n)     # non-differentiable pick
    r1,r2  ~ U(0,1)
    p      = (1−√r1)·v1[idx] + √r1(1−r2)·v2[idx] + √r1·r2·v3[idx]

``torch.multinomial`` has no direct jit equivalent (SURVEY.md §7 hard-part #3);
we use inverse-CDF sampling: a prefix sum over masked areas + vectorized
``searchsorted``.  This is exactly categorical sampling, is O(n log F), static
shape, and keeps the whole pipeline on-device.  Face choice is wrapped in
``stop_gradient`` (matching the reference: gradients flow to vertices only
through the barycentric combine).

Low-discrepancy option: stratified u-draws reduce Chamfer-loss variance at no
cost; off by default to match reference semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .mesh import face_normals_areas, gather_face_verts


def sample_surface(
    key: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    face_mask: jax.Array,
    num_samples: int,
    *,
    stratified: bool = False,
) -> jax.Array:
    """Sample ``num_samples`` points from a padded mesh surface (unbatched).

    Args:
      key: PRNG key.
      verts: [V, 3].
      faces: [F, 3] int32.
      face_mask: [F] 0/1 — padded faces get zero sampling probability.
      num_samples: static int.
      stratified: use stratified uniforms over the area CDF.

    Returns:
      points [num_samples, 3]; gradients flow to ``verts`` through the
      barycentric combine only.  If the mesh has no live faces the points are
      all at the (masked) vertex 0 — callers mask whole samples at batch level.
    """
    k_face, k_bary = jax.random.split(key)
    _, areas = face_normals_areas(verts, faces, face_mask)
    cdf = jnp.cumsum(areas)
    total = jnp.maximum(cdf[-1], 1e-12)

    if stratified:
        base = (jnp.arange(num_samples) + jax.random.uniform(k_face, (num_samples,))) / num_samples
        u = base * total
    else:
        u = jax.random.uniform(k_face, (num_samples,)) * total
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, faces.shape[0] - 1)
    idx = jax.lax.stop_gradient(idx)

    v1, v2, v3 = gather_face_verts(verts, faces)
    r = jax.random.uniform(k_bary, (num_samples, 2))
    s = jnp.sqrt(r[:, 0:1])
    w1, w2, w3 = 1.0 - s, s * (1.0 - r[:, 1:2]), s * r[:, 1:2]
    pts = (
        w1 * jnp.take(v1, idx, axis=0)
        + w2 * jnp.take(v2, idx, axis=0)
        + w3 * jnp.take(v3, idx, axis=0)
    )
    return pts


def sample_surface_batched(
    key: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    face_mask: jax.Array,
    num_samples: int,
    *,
    stratified: bool = False,
) -> jax.Array:
    """[B,V,3],[B,F,3],[B,F] → [B, num_samples, 3] with per-sample keys."""
    keys = jax.random.split(key, verts.shape[0])
    return jax.vmap(
        lambda k, v, f, m: sample_surface(k, v, f, m, num_samples, stratified=stratified)
    )(keys, verts, faces, face_mask)
