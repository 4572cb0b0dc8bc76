"""Chamfer distance and F1 point-set metrics — ``jax.lax`` reference path.

Reference (SURVEY.md §2.1 #4, §3.4–3.5): materializes the full ``N×M`` squared
distance matrix via broadcasting, takes row/col mins for the symmetric Chamfer
loss, and thresholds the same mins for F1@τ evaluation (τ = 1e-4 on squared
distances, paper protocol).

TPU notes: the pairwise matrix is computed in matmul form
``‖x‖² + ‖y‖² − 2·x@yᵀ`` so the O(N·M·3) inner product rides the MXU.  This
module is the lax-only implementation used as (a) the correctness oracle for
the fused Pallas kernel (ops/chamfer_pallas.py), and (b) the eval-path metric.
The Pallas kernel never materializes ``N×M`` in HBM (BASELINE.json
north_star); this one does, which is fine up to ~16k×16k points.

Masking convention: invalid points carry mask 0 and are excluded from both the
min (distance +inf) and the mean (weight 0).  Masked results are bit-identical
to computing on the unpadded sets (SURVEY.md §4.3's #1 bug class).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e30


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """[..., N, 3] × [..., M, 3] → [..., N, M] squared euclidean distances.

    Computed in matmul form so the O(N·M·3) contraction rides the MXU, at
    ``Precision.HIGHEST`` — the default (bf16 passes on TPU) gives ~1e-2
    absolute error, which would corrupt F1@τ=1e-4 thresholding.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=-1)
    yy = jnp.sum(y * y, axis=-1)
    xy = jnp.einsum(
        "...nd,...md->...nm", x, y,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d = xx[..., :, None] + yy[..., None, :] - 2.0 * xy
    return jnp.maximum(d, 0.0)


def nearest_sqdists(
    x: jax.Array,
    y: jax.Array,
    x_mask: Optional[jax.Array] = None,
    y_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Row mins ``min_j ‖x_i−y_j‖²`` [..., N] and col mins [..., M]."""
    d = pairwise_sqdist(x, y)
    d_row = d if y_mask is None else d + (1.0 - y_mask)[..., None, :] * _BIG
    d_col = d if x_mask is None else d + (1.0 - x_mask)[..., :, None] * _BIG
    return jnp.min(d_row, axis=-1), jnp.min(d_col, axis=-2)


def _masked_mean(v: jax.Array, mask: Optional[jax.Array], axis: int = -1) -> jax.Array:
    if mask is None:
        return jnp.mean(v, axis=axis)
    return jnp.sum(v * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1.0)


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    x_mask: Optional[jax.Array] = None,
    y_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Symmetric Chamfer: mean_i min_j d² + mean_j min_i d².  [...] → scalar/batch.

    Matches the reference loss (SURVEY.md §3.5 last line) including the
    sum-of-two-means convention.
    """
    d_xy, d_yx = nearest_sqdists(x, y, x_mask, y_mask)
    return _masked_mean(d_xy, x_mask) + _masked_mean(d_yx, y_mask)


def f1_score(
    pred: jax.Array,
    gt: jax.Array,
    pred_mask: Optional[jax.Array] = None,
    gt_mask: Optional[jax.Array] = None,
    tau: float = 1e-4,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """F1@τ on squared distances (the metric of record, SURVEY.md §3.4 [B:2]).

    precision = fraction of pred points within √τ of GT;
    recall    = fraction of GT points within √τ of pred;
    F1 = 2PR/(P+R) (0 where P+R = 0).  Returns (f1, precision, recall),
    each [...] batch-shaped, in [0, 1].
    """
    d_pg, d_gp = nearest_sqdists(pred, gt, pred_mask, gt_mask)
    precision = _masked_mean((d_pg < tau).astype(jnp.float32), pred_mask)
    recall = _masked_mean((d_gp < tau).astype(jnp.float32), gt_mask)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2.0 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    return f1, precision, recall
