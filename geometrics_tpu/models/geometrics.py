"""The flagship single-image mesh-reconstruction model (GEOMetrics).

Composes the pieces exactly as the reference main driver does (SURVEY.md §3.3,
reconstructed from ``GEOMetrics.py`` — mount empty): CNN image encoder →
[perceptual pooling → GCN deformation block → adaptive face split] × 3, with
the split skipped after the last block.  All topology growth is masked buffer
growth (core/splitting.py), so the entire forward — including both splits —
is ONE static-shape XLA program; the reference's per-sample Python loop
(SURVEY.md §3.3 ★) does not exist here.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.mesh import MeshBuffer
from ..core.splitting import face_curvature_scores_batched, split_mesh_buffer
from .gcn import GCNDeformationBlock
from .image_encoder import ImageEncoder
from .perceptual_pooling import Camera, DEFAULT_FOV_DEG, perceptual_pool


class BlockOutput(NamedTuple):
    """Per-deformation-block record, consumed by the loss (train/losses.py).

    ``verts_before``/``mesh`` share topology (the split happens *after* this
    record is taken), which is what the Laplacian-move regularizer requires
    (core/losses.py laplacian_move_loss).
    """

    verts_before: jax.Array  # [B, V, 3] coords entering the block
    mesh: MeshBuffer         # state after deformation, before any split
    num_split: jax.Array     # [B] splits fired after this block (0 for last)


class GEOMetricsOutput(NamedTuple):
    mesh: MeshBuffer                     # final predicted mesh
    blocks: Tuple[BlockOutput, ...]      # one per deformation block


class GEOMetricsModel(nn.Module):
    """images [B,H,W,3] + camera + init MeshBuffer → deformed MeshBuffer."""

    image_size: int = 137
    fov_deg: float = DEFAULT_FOV_DEG
    num_blocks: int = 3
    hidden: int = 192
    block_depth: int = 6
    carried_dim: int = 192
    cnn_widths: Tuple[int, ...] = (32, 64, 128, 256)
    # splitting (between blocks only; 0 disables → fixed topology, config [B:8])
    splits_per_round: int = 0
    split_threshold: float = 0.0
    adjacency_mode: str = "segment"  # "segment" | "dense" | "pallas" (gcn.py)
    scan_layers: bool = False        # lax.scan over GCN depth (fast compile)
    remat: bool = False              # rematerialize blocks (HBM ↓, FLOPs ↑)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, images: jax.Array, camera: Camera, mesh: MeshBuffer
    ) -> GEOMetricsOutput:
        feature_maps = ImageEncoder(widths=self.cnn_widths, dtype=self.dtype,
                                    name="image_encoder")(images)
        carried = jnp.zeros(
            mesh.verts.shape[:2] + (self.carried_dim,), jnp.float32)
        blocks = []
        for b in range(self.num_blocks):
            pooled = perceptual_pool(
                feature_maps, mesh.verts, camera, self.image_size, self.fov_deg)
            block_cls = GCNDeformationBlock
            if self.remat:
                block_cls = nn.remat(GCNDeformationBlock,
                                     static_argnums=())
            delta, carried = block_cls(
                hidden=self.hidden, depth=self.block_depth,
                out_features=self.carried_dim, dtype=self.dtype,
                adjacency_mode=self.adjacency_mode,
                scan_layers=self.scan_layers,
                name=f"block{b}",
            )(mesh.verts, pooled, carried, mesh.faces, mesh.face_mask,
              mesh.vert_mask)
            verts_before = mesh.verts
            mesh = mesh.replace(verts=mesh.verts + delta)

            num_split = jnp.zeros((mesh.batch_size,), jnp.int32)
            if self.splits_per_round > 0 and b < self.num_blocks - 1:
                scores = face_curvature_scores_batched(
                    mesh.verts, mesh.faces, mesh.face_mask)
                blocks.append(BlockOutput(verts_before, mesh, num_split))
                mesh, carried, num_split = split_mesh_buffer(
                    mesh, carried, scores, self.splits_per_round,
                    self.split_threshold)
                blocks[-1] = BlockOutput(verts_before, blocks[-1].mesh, num_split)
            else:
                blocks.append(BlockOutput(verts_before, mesh, num_split))
        return GEOMetricsOutput(mesh=mesh, blocks=tuple(blocks))
