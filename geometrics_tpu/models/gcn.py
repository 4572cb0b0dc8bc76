"""Graph-convolution layers and mesh-deformation blocks (flax).

Reference (SURVEY.md §2.1 #8, reconstructed from ``models.py`` — the mount was
empty): Kipf-style graph conv ``H' = σ(Â H W₀ + H W₁)`` with a separate
self/skip weight, stacked into deformation blocks that map
``[coords ‖ pooled image feats ‖ carried vertex feats]`` to coordinate deltas
plus new carried features; three blocks run sequentially with adaptive face
splitting in between (SURVEY.md §3.3).

TPU-native design decisions:
  * the neighbor aggregation is a masked segment-sum over the face-derived
    COO edge multiset (core/adjacency.py), NOT a dense ``V×V`` matmul — the
    dense form is ~6/V sparse and would waste MXU cycles at V≈2500;
  * both dense projections (self + neighbor) are ``[B·V, D]×[D, D']`` matmuls
    that tile straight onto the MXU; aggregation is bandwidth-bound and fuses
    with the surrounding elementwise ops under jit (ops/spmm_pallas.py holds
    the Pallas variant for the hot path);
  * padded vertices are zeroed at block boundaries so garbage in slack rows
    can never leak through aggregation into live rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.adjacency import (
    aggregate_neighbors_batched,
    aggregate_neighbors_dense,
    normalized_adjacency_dense_batched,
)


class GraphConv(nn.Module):
    """One graph convolution: ``h'_i = W_self h_i + W_nbr mean_{j∈N(i)} h_j + b``.

    The two projections are separate Dense layers (the reference's
    self/neighbor weight split); activation is applied by the caller so blocks
    can place residuals before the nonlinearity.

    Aggregation path: segment-sum over face corners by default; if ``adj``
    is passed, aggregation is a batched MXU matmul — either a precomputed
    dense normalized adjacency Â [B,V,V] (``aggregation="dense"``) or raw
    edge-multiset counts consumed by the fused Pallas SpMM kernel
    (``aggregation="pallas"``, ops/spmm_pallas.py: binarize + matmul +
    degree-normalize in one HBM pass).  The block builds ``adj`` once per
    topology state and amortizes it over its layers.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU); params stay f32
    aggregation: str = "dense"  # meaning of ``adj`` when passed: dense|pallas

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,       # [B, V, D]
        faces: jax.Array,       # [B, F, 3] int32
        face_mask: jax.Array,   # [B, F]
        vert_mask: jax.Array,   # [B, V]
        adj: Optional[jax.Array] = None,  # [B, V, V] Â or raw counts (MXU path)
    ) -> jax.Array:
        feats = feats * vert_mask[..., None]  # never aggregate slack garbage
        if adj is not None and self.aggregation == "pallas":
            from ..ops.spmm_pallas import spmm_mean_batched

            nbr = spmm_mean_batched(adj, feats)
        elif adj is not None:
            nbr = aggregate_neighbors_dense(feats, adj)
        else:
            nbr = aggregate_neighbors_batched(feats, faces, face_mask)
        h = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="self_proj")(feats)
        h = h + nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         name="nbr_proj")(nbr)
        return h * vert_mask[..., None]


class GCNDeformationBlock(nn.Module):
    """One mesh-deformation block: GCN stack → (Δcoords, carried feats).

    Mirrors the reference block structure (SURVEY.md §2.1 #8): input is
    ``[coords ‖ pooled image feats ‖ carried feats]``; a first conv lifts to
    ``hidden``, ``depth`` residual convs refine, two heads emit the coordinate
    delta and the carried feature vector for the next block.

    The Δcoords head is zero-initialized so an untrained model is the identity
    deformation — training starts from the intact init sphere.
    """

    hidden: int = 192
    depth: int = 6
    out_features: int = 192
    adjacency_mode: str = "segment"  # "segment" | "dense" | "pallas"
    scan_layers: bool = False  # lax.scan over the residual stack: ~depth×
                               # smaller HLO → much faster TPU first-compile;
                               # params become stacked [depth, ...]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        coords: jax.Array,       # [B, V, 3]
        pooled: jax.Array,       # [B, V, P] perceptual features (may be empty)
        carried: Optional[jax.Array],  # [B, V, C] or None (first block)
        faces: jax.Array,
        face_mask: jax.Array,
        vert_mask: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        parts = [coords, pooled]
        if carried is not None:
            parts.append(carried)
        h = jnp.concatenate(parts, axis=-1)

        # topology is constant within a block — build Â (or the raw counts
        # the Pallas kernel binarizes itself) once, reuse per layer
        adj = None
        if self.adjacency_mode == "dense":
            adj = normalized_adjacency_dense_batched(
                faces, face_mask, coords.shape[-2])
        elif self.adjacency_mode == "pallas":
            from ..ops.spmm_pallas import adjacency_counts_batched

            adj = adjacency_counts_batched(faces, face_mask, coords.shape[-2])
        conv = functools.partial(GraphConv, dtype=self.dtype,
                                 aggregation=self.adjacency_mode)

        h = conv(self.hidden, name="lift")(h, faces, face_mask, vert_mask, adj)
        h = nn.relu(h)
        if self.scan_layers:
            def body(block, h, _):
                r = block(h, faces, face_mask, vert_mask, adj)
                return nn.relu(h + r), None

            scanned = nn.scan(
                body, variable_axes={"params": 0}, split_rngs={"params": True},
                length=self.depth)
            h, _ = scanned(conv(self.hidden, name="convs"), h, None)
        else:
            for i in range(self.depth):
                r = conv(self.hidden, name=f"conv{i}")(
                    h, faces, face_mask, vert_mask, adj)
                h = nn.relu(h + r)  # residual keeps deep stacks trainable

        delta = nn.Dense(
            3, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="delta_head",
        )(h)
        feats_out = conv(self.out_features, name="feat_head")(
            h, faces, face_mask, vert_mask, adj)
        feats_out = nn.relu(feats_out)
        mask = vert_mask[..., None]
        return delta.astype(jnp.float32) * mask, feats_out * mask


class MeshEncoder(nn.Module):
    """Mesh graph → fixed-dim latent (the AE encoder, SURVEY.md §2.1 #9).

    GCN layers over ``[coords]`` followed by masked global max+mean pooling
    and an MLP head.  Used frozen inside the main trainer for the latent loss
    ``‖E(pred) − E(gt)‖²`` (SURVEY.md §3.3).
    """

    hidden: int = 128
    depth: int = 4
    latent_dim: int = 128
    adjacency_mode: str = "dense"  # topology is fixed per call → build Â
                                   # once, amortize over depth+1 layers (the
                                   # segment path costs ~16× more fwd+bwd at
                                   # V=1152 per the adjacency shoot-out)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        coords: jax.Array,      # [B, V, 3]
        faces: jax.Array,       # [B, F, 3]
        face_mask: jax.Array,   # [B, F]
        vert_mask: jax.Array,   # [B, V]
    ) -> jax.Array:             # [B, latent_dim]
        adj = None
        if self.adjacency_mode == "dense":
            adj = normalized_adjacency_dense_batched(
                faces, face_mask, coords.shape[-2])
        h = GraphConv(self.hidden, dtype=self.dtype, name="lift")(
            coords, faces, face_mask, vert_mask, adj)
        h = nn.relu(h)
        for i in range(self.depth):
            r = GraphConv(self.hidden, dtype=self.dtype, name=f"conv{i}")(
                h, faces, face_mask, vert_mask, adj)
            h = nn.relu(h + r)

        mask = vert_mask[..., None]
        neg_inf = jnp.asarray(-1e30, h.dtype)
        h_max = jnp.max(jnp.where(mask > 0, h, neg_inf), axis=-2)
        h_max = jnp.where(jnp.any(mask > 0, axis=-2), h_max, 0.0)
        h_mean = jnp.sum(h * mask, axis=-2) / jnp.maximum(
            jnp.sum(mask, axis=-2), 1.0)
        z = jnp.concatenate([h_max, h_mean], axis=-1)
        z = nn.relu(nn.Dense(self.latent_dim, dtype=self.dtype, name="fc1")(z))
        z = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc2")(z)
        return z.astype(jnp.float32)
