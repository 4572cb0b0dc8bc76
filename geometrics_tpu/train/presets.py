"""The five BASELINE.json integration configs as named presets.

BASELINE.json lists the reference's capability ladder (SURVEY.md §4.4):
  [B:7]  overfit      — single-image sphere-init GCN deform + Chamfer, one sample
  [B:8]  fixed_topo   — batched fixed-topology GCN + differentiable sampling
  [B:9]  autoencoder  — mesh→voxel AE pretrain (latent-loss encoder path)
  [B:10] splitting    — adaptive face-splitting with padded/masked topology
  [B:11] full         — full 13-class run (Chamfer + latent + edge/Laplacian)

`python -m geometrics_tpu.train.presets --preset full` runs one end-to-end;
each returns the result dict of its trainer.  Presets use the synthetic
dataset (no network in this environment — SURVEY.md §0); point
``data_root`` at a prepared tree (data/prep.py layout) to use disk data.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

from .config import AutoEncoderConfig, MeshBudget, ModelConfig, TrainConfig
from .losses import LossWeights


def overfit_config(run_dir: str = "runs/overfit") -> TrainConfig:
    """[B:7] — overfit one sample to near-zero Chamfer."""
    return TrainConfig(
        model=ModelConfig(splits_per_round=0, scan_layers=True),
        mesh=MeshBudget(subdivisions=2, v_max=192, f_max=384),
        batch_size=2, learning_rate=1e-3, epochs=300,
        loss=LossWeights(chamfer=1.0, latent=0.0, edge=0.05, laplacian=0.02,
                         laplacian_move=0.02),
        num_classes=1, models_per_class=1, test_fraction=0.0,
        surface_samples=2048, gt_points=2048,
        checkpoint_dir=run_dir, multi_stage_chamfer=False)


def fixed_topology_config(run_dir: str = "runs/fixed_topo") -> TrainConfig:
    """[B:8] — batched fixed-topology training on one class."""
    return TrainConfig(
        model=ModelConfig(splits_per_round=0, scan_layers=True),
        mesh=MeshBudget(subdivisions=2, v_max=192, f_max=384),
        batch_size=16, epochs=60, num_classes=1, models_per_class=64,
        loss=LossWeights(latent=0.0),
        checkpoint_dir=run_dir)


def autoencoder_config(run_dir: str = "runs/ae") -> AutoEncoderConfig:
    """[B:9] — AE pretrain for the latent loss."""
    return AutoEncoderConfig(epochs=40, checkpoint_dir=run_dir)


def splitting_config(run_dir: str = "runs/splitting") -> TrainConfig:
    """[B:10] — adaptive splitting: vertex counts grow, loss still falls."""
    return TrainConfig(
        model=ModelConfig(splits_per_round=48, split_threshold=0.1,
                          scan_layers=True),
        mesh=MeshBudget(subdivisions=2, v_max=384, f_max=960),
        batch_size=16, epochs=60, num_classes=4, models_per_class=32,
        loss=LossWeights(latent=0.0),
        checkpoint_dir=run_dir)


def full_config(run_dir: str = "runs/full",
                ae_dir: str = "runs/ae") -> TrainConfig:
    """[B:11] — full 13-class run with every loss term.

    Model flags (bf16 + scanned layers + dense adjacency + v_max 384) are
    kept IDENTICAL to bench.py's config so the training run and the
    benchmark share one compiled program family (TPU first-compile through
    the remote service is minutes; the persistent cache amortizes it)."""
    return TrainConfig(
        model=ModelConfig(splits_per_round=48, split_threshold=0.0,
                          scan_layers=True, adjacency_mode="dense",
                          bfloat16=True),
        mesh=MeshBudget(subdivisions=2, v_max=384, f_max=960),
        batch_size=32, epochs=80, num_classes=13, models_per_class=32,
        encoder_checkpoint=ae_dir,
        checkpoint_dir=run_dir)


def highres_config(run_dir: str = "runs/highres",
                   ae_dir: str = "runs/ae") -> TrainConfig:
    """Paper-scale vertex budget: two 480-face split rounds grow the sphere
    162 → ~1122 verts (the paper caps around 2.5k [P]).  Costs ~4× the
    flagship step; use when chasing F1 rather than throughput."""
    return TrainConfig(
        model=ModelConfig(splits_per_round=480, split_threshold=0.0,
                          scan_layers=True, adjacency_mode="dense",
                          bfloat16=True),
        mesh=MeshBudget(subdivisions=2, v_max=1152, f_max=2304),
        batch_size=16, epochs=200, num_classes=13, models_per_class=32,
        surface_samples=4096, gt_points=4096,
        encoder_checkpoint=ae_dir,
        checkpoint_dir=run_dir)


def paperres_config(run_dir: str = "runs/paperres",
                    ae_dir: str = "runs/ae") -> TrainConfig:
    """TRUE paper-scale vertex budget: ~2.5k verts (SURVEY §2.1 #5 [P]).

    Splitting is capacity-gated per round by the LIVE face count (a round can
    split at most every live face), so from the level-2 icosphere (162 v /
    320 f) two rounds top out at 162+320+960=1442 verts.  Paper scale instead
    starts from the level-3 icosphere (642 v / 1280 f) and splits 930 faces
    per round: 642 + 930 + 930 = 2502 verts, 1280 + 2·930 + 2·930 = 5000
    faces — inside v_max=2560 / f_max=5120 (20×128 / 40×128 lane tiles).
    Model parameters are V-agnostic (CNN + GCN weights), so highres
    checkpoints warm-start this budget directly.
    """
    return TrainConfig(
        model=ModelConfig(splits_per_round=930, split_threshold=0.0,
                          scan_layers=True, adjacency_mode="dense",
                          bfloat16=True),
        mesh=MeshBudget(subdivisions=3, v_max=2560, f_max=5120),
        batch_size=16, epochs=200, num_classes=13, models_per_class=32,
        surface_samples=4096, gt_points=4096,
        encoder_checkpoint=ae_dir,
        checkpoint_dir=run_dir)


def paperres_xl_config(run_dir: str = "runs/paperres_xl",
                       ae_dir: str = "runs/ae") -> TrainConfig:
    """paperres + the capacity lever: the round-3 plateau diagnosis
    (RESULTS.md) found train≈test F1 — the model is accuracy-bound, not
    data-bound — so the next climb scales capacity (hidden/carried 192→256,
    CNN widths ×1.5) and turns on EMA eval (ema_decay=0.999 ≈ a ~1-epoch
    average at 1020 steps/epoch).  Lane-aligned sizes (256 = 2×128); step
    cost grows ~1.7× over paperres; the remote-worker envelope (batch 16 /
    k≤20) still applies — probe one epoch before committing a long run."""
    return TrainConfig(
        model=ModelConfig(hidden=256, carried_dim=256,
                          cnn_widths=(48, 96, 192, 384),
                          splits_per_round=930, split_threshold=0.0,
                          scan_layers=True, adjacency_mode="dense",
                          bfloat16=True),
        mesh=MeshBudget(subdivisions=3, v_max=2560, f_max=5120),
        batch_size=16, epochs=200, num_classes=13, models_per_class=32,
        surface_samples=4096, gt_points=4096, ema_decay=0.999,
        encoder_checkpoint=ae_dir,
        checkpoint_dir=run_dir)


PRESETS = {
    "overfit": overfit_config,
    "fixed_topo": fixed_topology_config,
    "autoencoder": autoencoder_config,
    "splitting": splitting_config,
    "full": full_config,
    "highres": highres_config,
    "paperres": paperres_config,
    "paperres_xl": paperres_xl_config,
}


def run_preset(name: str, argv=None) -> Dict[str, Any]:
    from ..utils.cli import parse_into

    cfg = parse_into(PRESETS[name](), argv)
    if isinstance(cfg, AutoEncoderConfig):
        from .autoencoder import train_autoencoder

        return train_autoencoder(cfg)
    from .trainer import train_geometrics

    return train_geometrics(cfg)


def main() -> None:
    import sys

    argv = sys.argv[1:]
    if not argv or argv[0] not in ("--preset",):
        raise SystemExit(f"usage: presets --preset {{{','.join(PRESETS)}}} [overrides]")
    name = argv[1]
    result = run_preset(name, argv[2:])
    ev = result.get("eval") or {}
    print(json.dumps({k: v for k, v in ev.items() if not isinstance(v, dict)}
                     or {"status": "done"}))


if __name__ == "__main__":
    main()
