"""Latent → 32³ occupancy decoder (flax).

Reference (SURVEY.md §2.1 #10): FC + 3D transposed-conv stack producing 32³
occupancy logits; trained with voxel BCE against binvox grids in the AE
pretrain (auto_encoder.py, §3.2) so the MeshEncoder latent carries shape
information for the latent loss.

TPU notes: ConvTranspose in 3D lowers to MXU convolutions; channels are kept
at 128/64/32 so lane tiling is clean, and the whole decoder is one fused XLA
graph — it only runs during AE pretraining and (frozen encoder only) never on
the main training hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class VoxelDecoder(nn.Module):
    """[B, Z] latent → [B, R, R, R] occupancy logits (R = resolution)."""

    resolution: int = 32
    base_channels: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        r0 = self.resolution // 8  # three 2× upsampling stages
        c = self.base_channels
        h = nn.Dense(r0 * r0 * r0 * c, dtype=self.dtype, name="fc")(z)
        h = nn.relu(h)
        h = h.reshape(z.shape[0], r0, r0, r0, c)
        for i, ch in enumerate([c, c // 2, c // 4]):
            h = nn.ConvTranspose(
                ch, (4, 4, 4), strides=(2, 2, 2), padding="SAME",
                dtype=self.dtype, name=f"up{i}")(h)
            h = nn.relu(h)
        logits = nn.Conv(1, (3, 3, 3), padding="SAME", dtype=self.dtype,
                         name="head")(h)
        return logits[..., 0].astype(jnp.float32)


def voxel_bce_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy from logits: [B,R,R,R] × [B,R,R,R] → [B]."""
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per, axis=(-3, -2, -1))


def voxel_iou(logits: jax.Array, targets: jax.Array, thresh: float = 0.0) -> jax.Array:
    """Occupancy IoU at a logit threshold (AE pretrain sanity metric): → [B]."""
    pred = logits > thresh
    gt = targets > 0.5
    inter = jnp.sum(pred & gt, axis=(-3, -2, -1)).astype(jnp.float32)
    union = jnp.sum(pred | gt, axis=(-3, -2, -1)).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)
