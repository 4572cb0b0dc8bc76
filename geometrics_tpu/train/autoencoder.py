"""Mesh→voxel autoencoder pretrain (auto_encoder.py equivalent, SURVEY.md §3.2).

Trains MeshEncoder (GCN→latent) + VoxelDecoder (latent→32³ occupancy) with
voxel BCE so the encoder latent carries shape information; the encoder is then
frozen and handed to the main trainer for the latent loss (config [B:9] →
[B:11] handoff).

One jitted, data-sharded train step; whole-batch graphs (fixed GT topology
from the dataset) — no per-sample loop anywhere.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..data.loader import BatchIterator, train_test_split
from ..data.synthetic import SyntheticConfig, SyntheticShapeDataset
from ..models.gcn import MeshEncoder
from ..models.voxel_decoder import VoxelDecoder, voxel_bce_loss, voxel_iou
from ..parallel.sharding import make_mesh_for_batch, replicate_tree, shard_batch
from ..utils.checkpoint import Checkpointer
from ..utils.heartbeat import beat
from ..utils.logging import MetricsLogger
from .config import AutoEncoderConfig


class MeshVoxelAE(nn.Module):
    """Encoder+decoder pair; params tree = {'encoder':…, 'decoder':…}."""

    latent_dim: int = 128
    encoder_hidden: int = 128
    encoder_depth: int = 4
    voxel_res: int = 32

    def setup(self):
        self.encoder = MeshEncoder(
            hidden=self.encoder_hidden, depth=self.encoder_depth,
            latent_dim=self.latent_dim, name="encoder")
        self.decoder = VoxelDecoder(resolution=self.voxel_res, name="decoder")

    def __call__(self, verts, faces, face_mask, vert_mask):
        z = self.encoder(verts, faces, face_mask, vert_mask)
        return self.decoder(z), z

    def encode(self, verts, faces, face_mask, vert_mask):
        return self.encoder(verts, faces, face_mask, vert_mask)


def _full_masks(batch: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    b, v = batch["gt_verts"].shape[:2]
    f = batch["gt_faces"].shape[1]
    return jnp.ones((b, f), jnp.float32), jnp.ones((b, v), jnp.float32)


def make_ae_train_step(model: MeshVoxelAE, tx: optax.GradientTransformation):
    def loss_fn(params, batch):
        fmask, vmask = _full_masks(batch)
        logits, _ = model.apply(
            {"params": params}, batch["gt_verts"], batch["gt_faces"],
            fmask, vmask)
        loss = jnp.mean(voxel_bce_loss(logits, batch["voxels"]))
        iou = jnp.mean(voxel_iou(logits, batch["voxels"]))
        return loss, {"bce": loss, "iou": iou}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return step


def train_autoencoder(config: AutoEncoderConfig,
                      dataset: Optional[SyntheticShapeDataset] = None,
                      max_steps: Optional[int] = None) -> Dict[str, Any]:
    """Full AE pretrain; returns {'params', 'metrics', 'checkpoint_dir'}."""
    if dataset is None:
        dataset = SyntheticShapeDataset(SyntheticConfig(
            num_classes=config.num_classes,
            models_per_class=config.models_per_class,
            seed=config.seed, render=False, voxels=True))
    if hasattr(dataset, "config"):
        train_idx, test_idx = train_test_split(dataset)
    else:  # a PreparedDataset split: carve a held-out slice for the AE eval
        # (the on-disk "test" split may lack voxels; a within-split holdout
        # still measures encoder generalization, which is what the frozen
        # latent loss depends on).  STRIDED, not a tail: prep.py writes
        # split lists class-ordered, so a contiguous tail would be ~one
        # whole class never seen in training (ADVICE r3) — every 10th index
        # keeps the holdout class-balanced.
        all_idx = np.arange(len(dataset))
        test_idx = all_idx[::10]
        train_idx = np.setdiff1d(all_idx, test_idx)

    model = MeshVoxelAE(
        latent_dim=config.latent_dim, encoder_hidden=config.encoder_hidden,
        encoder_depth=config.encoder_depth, voxel_res=config.voxel_res)
    sample = dataset.get(0)
    init_batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
                  if k in ("gt_verts", "gt_faces")}
    fmask = jnp.ones((1, init_batch["gt_faces"].shape[1]), jnp.float32)
    vmask = jnp.ones((1, init_batch["gt_verts"].shape[1]), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(config.seed), init_batch["gt_verts"],
        init_batch["gt_faces"], fmask, vmask)["params"]

    tx = optax.adam(config.learning_rate)
    opt_state = tx.init(params)
    mesh = make_mesh_for_batch(config.batch_size)
    params = replicate_tree(params, mesh)
    opt_state = replicate_tree(opt_state, mesh)
    step_fn = make_ae_train_step(model, tx)

    logger = MetricsLogger(config.checkpoint_dir, "ae_metrics")
    ckpt = Checkpointer(config.checkpoint_dir)
    it = BatchIterator(dataset, config.batch_size, seed=config.seed,
                       indices=train_idx)
    step = 0
    aux = {}
    for epoch in range(config.epochs):
        for batch in it:
            beat("ae_step")
            batch = shard_batch(
                {k: batch[k] for k in ("gt_verts", "gt_faces", "voxels")}, mesh)
            params, opt_state, aux = step_fn(params, opt_state, batch)
            if step % config.log_every == 0:
                logger.log(step, aux, epoch=epoch)
            step += 1
            if max_steps is not None and step >= max_steps:
                break
        if max_steps is not None and step >= max_steps:
            break
    aux = jax.device_get(aux)
    test_metrics = evaluate_autoencoder(params, model, dataset, test_idx,
                                        config.batch_size, mesh)
    if test_metrics:
        aux = {**aux, **test_metrics}
        logger.log(step, test_metrics)
    ckpt.save(step, {"params": jax.device_get(params), "step": step}, wait=True)
    logger.close()
    return {"params": params, "metrics": aux,
            "checkpoint_dir": config.checkpoint_dir, "model": model}


def evaluate_autoencoder(params, model: MeshVoxelAE, dataset,
                         indices, batch_size: int, mesh) -> Dict[str, float]:
    """Held-out voxel BCE/IoU — the number that matters for the frozen-encoder
    handoff (train-batch IoU alone says nothing about generalization)."""
    if len(indices) < batch_size:
        return {}

    @jax.jit
    def eval_step(params, batch):
        fmask, vmask = _full_masks(batch)
        logits, _ = model.apply(
            {"params": params}, batch["gt_verts"], batch["gt_faces"],
            fmask, vmask)
        return (jnp.mean(voxel_bce_loss(logits, batch["voxels"])),
                jnp.mean(voxel_iou(logits, batch["voxels"])))

    it = BatchIterator(dataset, batch_size, shuffle=False,
                       indices=np.asarray(indices), drop_remainder=True)
    bces, ious = [], []
    for batch in it:
        beat("ae_eval")
        batch = shard_batch(
            {k: batch[k] for k in ("gt_verts", "gt_faces", "voxels")}, mesh)
        bce, iou = jax.device_get(eval_step(params, batch))
        bces.append(float(bce))
        ious.append(float(iou))
    if not bces:
        return {}
    return {"test_bce": float(np.mean(bces)), "test_iou": float(np.mean(ious)),
            "test_batches": len(bces)}


def main(argv=None) -> None:
    """CLI entry (auto_encoder.py equivalent)."""
    import json

    from ..utils.cli import parse_into

    config = parse_into(AutoEncoderConfig(), argv)
    result = train_autoencoder(config)
    print(json.dumps({k: float(v) for k, v in result["metrics"].items()}))


if __name__ == "__main__":
    main()
