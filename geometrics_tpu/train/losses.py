"""Composite GEOMetrics training loss (SURVEY.md §3.3 L3).

total = w₁·Chamfer(sampled pred surface, GT points)
      + w₂·‖E(pred mesh) − E(gt mesh)‖²   (frozen MeshEncoder latent loss)
      + w₃·edge-length + w₄·Laplacian (+ w₅·Laplacian-move between blocks)

Each term comes from core/ (lax implementations) or ops/ (Pallas fused
Chamfer on TPU); the composition here is pure function-of-pytrees so the
whole loss fuses into the training step's XLA graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.chamfer import chamfer_distance
from ..core.losses import (
    edge_length_loss,
    laplacian_loss,
    laplacian_move_loss,
    latent_loss,
)
from ..core.sampling import sample_surface_batched
from ..models.geometrics import GEOMetricsOutput


@dataclass(frozen=True)
class LossWeights:
    """Loss-term weights.  Reference defaults are argparse flags we cannot
    read (mount empty); these values follow the paper's loss composition [P]
    with Chamfer dominant, and are config-overridable (train/config.py)."""

    chamfer: float = 1.0
    latent: float = 0.05
    edge: float = 0.15
    laplacian: float = 0.1
    laplacian_move: float = 0.1


def geometrics_loss(
    key: jax.Array,
    output: GEOMetricsOutput,
    gt_points: jax.Array,              # [B, M, 3]
    weights: LossWeights,
    num_surface_samples: int,
    *,
    encode_fn=None,                    # (verts, faces, fmask, vmask) -> [B, Z]
    gt_mesh=None,                      # MeshBuffer of GT graphs (for latent)
    chamfer_fn=chamfer_distance,       # swap in ops.chamfer for the fused kernel
    multi_stage_chamfer: bool = True,  # supervise every block's mesh
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (scalar total loss, per-term scalar metrics dict)."""
    mesh = output.mesh
    aux: Dict[str, jax.Array] = {}

    # --- Chamfer on sampled surfaces -----------------------------------
    if multi_stage_chamfer:
        cham = 0.0
        keys = jax.random.split(key, len(output.blocks))
        for i, blk in enumerate(output.blocks):
            m = blk.mesh if i < len(output.blocks) - 1 else mesh
            pts = sample_surface_batched(
                keys[i], m.verts, m.faces, m.face_mask, num_surface_samples)
            cham = cham + jnp.mean(chamfer_fn(pts, gt_points))
        cham = cham / len(output.blocks)
    else:
        pts = sample_surface_batched(
            key, mesh.verts, mesh.faces, mesh.face_mask, num_surface_samples)
        cham = jnp.mean(chamfer_fn(pts, gt_points))
    aux["chamfer"] = cham

    # --- geometry regularizers (final mesh) ----------------------------
    edge = jnp.mean(edge_length_loss(mesh.verts, mesh.faces, mesh.face_mask))
    lap = jnp.mean(laplacian_loss(
        mesh.verts, mesh.faces, mesh.face_mask, mesh.vert_mask))
    aux["edge"] = edge
    aux["laplacian"] = lap

    # --- Laplacian move between blocks (same-topology pairs) -----------
    move = 0.0
    for blk in output.blocks:
        move = move + jnp.mean(laplacian_move_loss(
            blk.verts_before, blk.mesh.verts, blk.mesh.faces,
            blk.mesh.face_mask, blk.mesh.vert_mask))
    move = move / max(len(output.blocks), 1)
    aux["laplacian_move"] = move

    # --- latent loss via frozen MeshEncoder ----------------------------
    if encode_fn is not None and gt_mesh is not None:
        z_pred = encode_fn(mesh.verts, mesh.faces, mesh.face_mask, mesh.vert_mask)
        z_gt = encode_fn(gt_mesh.verts, gt_mesh.faces, gt_mesh.face_mask,
                         gt_mesh.vert_mask)
        lat = jnp.mean(latent_loss(z_pred, z_gt))
    else:
        lat = jnp.zeros(())
    aux["latent"] = lat

    total = (
        weights.chamfer * cham
        + weights.latent * lat
        + weights.edge * edge
        + weights.laplacian * lap
        + weights.laplacian_move * move
    )
    aux["total"] = total
    aux["verts_in_use"] = jnp.mean(jnp.sum(mesh.vert_mask, axis=-1))
    return total, aux
