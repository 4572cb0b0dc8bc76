"""Camera projection + bilinear perceptual feature pooling.

Reference (SURVEY.md §2.1 #7): vertices are projected into the render's image
plane using the 3D-R2N2 camera metadata (azimuth / elevation / distance), and
multi-scale CNN feature maps are bilinearly interpolated at the projected
coordinates, concatenated across scales, to give each vertex an image feature
vector (Pixel2Mesh-style perceptual pooling).

TPU notes (SURVEY.md §7 hard-part #4): the interpolation is expressed as four
batched ``take_along_axis`` gathers over the flattened H·W axis plus a
weighted sum — fully vectorized over [B, V], no scalar gathers, no
``map_coordinates`` host fallback.  Everything fuses into the surrounding jit.

Camera convention (the exact reference intrinsics are unverifiable — mount
empty; this module pins ONE convention and the synthetic renderer in
``data/synthetic.py`` uses the identical function, so train/render agree):
  * camera sits at spherical position
    ``C = d·(cos el·cos az, sin el, cos el·sin az)`` looking at the origin,
    world-up = +y;
  * pinhole intrinsics from a vertical FOV (default 49.13°, the 3D-R2N2
    Blender render setting: 35 mm focal / 32 mm sensor);
  * pixel coords have (0,0) at the top-left corner, u→right, v→down.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    """Batched look-at-origin camera: angles in radians, distance in world units."""

    azimuth: jax.Array    # [B]
    elevation: jax.Array  # [B]
    distance: jax.Array   # [B]


DEFAULT_FOV_DEG = 49.134  # 2·atan(16/35): 3D-R2N2's 35mm focal on a 32mm sensor


def camera_rotation(cam: Camera) -> Tuple[jax.Array, jax.Array]:
    """World→camera rotation R [B,3,3] and camera position C [B,3].

    Camera-space axes: +x right, +y down, +z forward (into the scene), so that
    image (u, v) grow right/down directly from (x, y).
    """
    caz, saz = jnp.cos(cam.azimuth), jnp.sin(cam.azimuth)
    cel, sel = jnp.cos(cam.elevation), jnp.sin(cam.elevation)
    pos = cam.distance[:, None] * jnp.stack([cel * caz, sel, cel * saz], axis=-1)
    fwd = -pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
    up_world = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), fwd.shape)
    right = jnp.cross(fwd, up_world)
    right = right / jnp.maximum(jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-9)
    down = jnp.cross(fwd, right)  # +y down in camera space
    rot = jnp.stack([right, down, fwd], axis=-2)  # rows = camera axes
    return rot, pos


def project_vertices(
    verts: jax.Array,  # [B, V, 3]
    cam: Camera,
    image_size: int,
    fov_deg: float = DEFAULT_FOV_DEG,
) -> Tuple[jax.Array, jax.Array]:
    """Project to pixel coords. Returns (uv [B,V,2] float, depth [B,V]).

    Depth is the camera-space z (positive in front of the camera); callers can
    use it for z-buffering (the synthetic renderer does).
    """
    rot, pos = camera_rotation(cam)
    p_cam = jnp.einsum("bij,bvj->bvi", rot, verts - pos[:, None, :])
    z = jnp.maximum(p_cam[..., 2], 1e-4)
    focal = (image_size / 2.0) / math.tan(math.radians(fov_deg) / 2.0)
    c = (image_size - 1) / 2.0
    u = focal * p_cam[..., 0] / z + c
    v = focal * p_cam[..., 1] / z + c
    return jnp.stack([u, v], axis=-1), p_cam[..., 2]


def bilinear_sample(feat_map: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear interpolation. feat_map [B,H,W,C], uv [B,V,2] (pixel units at
    this map's resolution) → [B,V,C].  Out-of-bounds coords clamp to the edge
    (matching torch grid_sample border padding, the reference's behavior class).

    Lowering note (round-2 profiling): indices must address whole [C] ROWS of
    the flattened map — ``take_along_axis`` with the index broadcast across C
    emits a per-ELEMENT gather (a [B·V·C] index array) that TPU executes at
    ~1.6 GB/s in a scalar custom fusion; at the highres budget those gathers
    were 57.9 ms EACH and consumed the entire 2.25 s train step.  The row
    gather below (one [B,4V] index array, channel dim as gather offset dims)
    is the DMA fast path; its transpose (scatter-add of rows in the backward)
    is likewise row-granular.
    """
    b, h, w, c = feat_map.shape
    u = jnp.clip(uv[..., 0], 0.0, w - 1.0)
    v = jnp.clip(uv[..., 1], 0.0, h - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = u - u0.astype(u.dtype)
    fv = v - v0.astype(v.dtype)

    flat = feat_map.reshape(b, h * w, c)
    idx = jnp.stack([v0 * w + u0, v0 * w + u1,
                     v1 * w + u0, v1 * w + u1], axis=1)      # [B, 4, V]
    rows = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(
        flat, idx.reshape(b, -1))                            # [B, 4V, C]
    p = rows.reshape(b, 4, -1, c)                            # [B, 4, V, C]
    wts = jnp.stack([(1 - fu) * (1 - fv), fu * (1 - fv),
                     (1 - fu) * fv, fu * fv], axis=1)        # [B, 4, V]
    return jnp.einsum("bkvc,bkv->bvc", p, wts)


def perceptual_pool(
    feature_maps: Sequence[jax.Array],  # each [B, H/s, W/s, C_s]
    verts: jax.Array,                   # [B, V, 3]
    cam: Camera,
    image_size: int,
    fov_deg: float = DEFAULT_FOV_DEG,
) -> jax.Array:
    """Per-vertex image features: project once, sample every scale, concat.

    Returns [B, V, ΣC_s].
    """
    uv, _ = project_vertices(verts, cam, image_size, fov_deg)
    pooled = []
    for fmap in feature_maps:
        scale = fmap.shape[2] / image_size
        pooled.append(bilinear_sample(fmap, uv * scale))
    return jnp.concatenate(pooled, axis=-1)
