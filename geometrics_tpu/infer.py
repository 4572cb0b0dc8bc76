"""User-facing inference API: checkpoint → batched single-image→mesh predictor.

The reference exposes reconstruction only through its training script's eval
path; for deployment this framework provides a standalone predictor:

    from geometrics_tpu.infer import Predictor
    p = Predictor.from_run_dir("runs/full_r2")
    meshes = p.predict(images, azimuth, elevation, distance)   # MeshBuffer
    p.export_objs(meshes, "out/")                               # .obj files

The jitted forward is compiled once per batch shape; inputs are plain arrays
(no framework types needed at the call site).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core.mesh import MeshBuffer, save_mesh_buffer_sample
from .models.perceptual_pooling import Camera


class Predictor:
    """Frozen-parameter batched mesh reconstructor."""

    def __init__(self, model, params, config, batch_size: int = 8):
        from .train.trainer import build_init_mesh

        self.model = model
        self.params = params
        self.config = config
        self.batch_size = batch_size
        self._init_mesh = build_init_mesh(config, batch_size)

        def fwd(params, images, az, el, dist, init_mesh):
            out = model.apply({"params": params}, images,
                              Camera(az, el, dist), init_mesh)
            return out.mesh

        self._fwd = jax.jit(fwd)

    @classmethod
    def from_run_dir(cls, run_dir: str, batch_size: int = 8,
                     step: Optional[int] = None) -> "Predictor":
        """Restore the latest (or given) checkpoint of a training run."""
        from .train.config import config_from_json
        from .train.trainer import build_model
        from .utils.checkpoint import Checkpointer

        with open(os.path.join(run_dir, "config.json")) as fh:
            config = config_from_json(json.load(fh))
        model = build_model(config)
        restored = Checkpointer(run_dir).restore_raw(step)
        # EMA runs serve their Polyak average when the snapshot carries one
        params = restored.get("ema") or restored["params"]
        return cls(model, params, config, batch_size)

    def predict(self, images: np.ndarray, azimuth: np.ndarray,
                elevation: np.ndarray, distance: np.ndarray) -> MeshBuffer:
        """images [B,H,W,3] float in [0,1] + camera arrays [B] → MeshBuffer.

        B may be at most the predictor's batch_size (the static compiled
        shape): ragged final batches are padded with repeats of the last
        sample and sliced back out, so callers never see the padding.
        """
        b = images.shape[0]
        if b > self.batch_size or b == 0:
            raise ValueError(f"batch {b} not in 1..{self.batch_size} "
                             f"(compiled batch)")
        pad = self.batch_size - b

        def p(x):
            x = np.asarray(x)
            return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]) if pad else x

        mesh = self._fwd(self.params, jnp.asarray(p(images)),
                         jnp.asarray(p(azimuth)), jnp.asarray(p(elevation)),
                         jnp.asarray(p(distance)), self._init_mesh)
        if pad:
            mesh = jax.tree_util.tree_map(lambda a: a[:b], mesh)
        return mesh

    def export_objs(self, mesh: MeshBuffer, out_dir: str,
                    prefix: str = "pred") -> Sequence[str]:
        """Write each batch element as an .obj; returns the paths."""
        os.makedirs(out_dir, exist_ok=True)
        mesh = jax.device_get(mesh)
        paths = []
        for i in range(mesh.batch_size):
            path = os.path.join(out_dir, f"{prefix}_{i:03d}.obj")
            save_mesh_buffer_sample(path, mesh, i)
            paths.append(path)
        return paths
