"""Full 13-class quality run (config [B:11]) on the prepared synthetic set.

Orchestrates the reference's two-script workflow end-to-end:
  1. (optional) AE pretrain → frozen MeshEncoder checkpoint   [auto_encoder.py]
  2. main training with the composite loss + eval              [GEOMetrics.py]
Writes eval JSON (mean + per-class Chamfer / F1@τ / F1@2τ) to
``<run_dir>/eval.json`` and sample meshes under ``<run_dir>/samples/``.

Usage:
  python experiments/run_full.py --run_dir runs/full_r1 --epochs 40 \
      [--with_latent true] [--data_root data/synthetic_shapenet]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


@dataclasses.dataclass(frozen=True)
class RunArgs:
    run_dir: str = "runs/full_r1"
    data_root: str = "data/synthetic_shapenet"
    preset: str = "full"   # any train preset: "full" (flagship/bench budget)
                           # | "highres" (1152-vert budget) | "paperres"
                           # (2502 verts, the paper's ~2.5k cap) |
                           # "paperres_xl" (paperres + hidden 256 + EMA)
    epochs: int = 40
    max_steps: int = 0     # stop after this many optimizer steps (0 = none);
                           # lets a resumed run finish an ORIGINAL-length
                           # cosine schedule without re-deriving epoch counts
    batch_size: int = 0    # 0 = keep the preset's batch; the relay charges a
                           # large fixed cost per dispatch, so bigger batches
                           # amortize it (same samples, fewer dispatches)
    with_latent: bool = False
    ae_epochs: int = 15
    eval_every: int = 10
    save_every: int = 0    # checkpoint cadence in epochs (0 = same as
                           # eval_every); decouple when an external budget
                           # cut-off may kill the run between evals
    eval_batch_size: int = 13
    steps_per_call: int = 1
    lr: float = 3e-4
    lr_schedule: str = "constant"
    edge_w: float = 0.15
    lap_w: float = 0.1
    move_w: float = 0.1
    log_every: int = 100
    ema_decay: float = -1.0  # <0 = keep the preset's value; >=0 overrides
                             # (0 disables, e.g. 0.999 ≈ 1-epoch average)
    reuse_ae: str = ""   # existing AE run dir → skip AE pretraining
    cpu: bool = False


def main() -> None:
    from geometrics_tpu.utils.cli import parse_into

    args = parse_into(RunArgs())
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geometrics_tpu.data.shapenet import PreparedDataset
    from geometrics_tpu.train.presets import PRESETS, autoencoder_config

    train_ds = PreparedDataset(args.data_root, "train")
    test_ds = PreparedDataset(args.data_root, "test")
    print(f"[run] {len(train_ds)} train / {len(test_ds)} test samples",
          flush=True)

    encoder_dir = None
    if args.with_latent:
        if args.reuse_ae and os.path.isdir(args.reuse_ae):
            encoder_dir = args.reuse_ae
            print(f"[run] reusing frozen encoder from {encoder_dir}",
                  flush=True)
        else:
            from geometrics_tpu.train.autoencoder import train_autoencoder

            ae_cfg = dataclasses.replace(
                autoencoder_config(os.path.join(args.run_dir, "ae")),
                epochs=args.ae_epochs,
                models_per_class=train_ds.manifest["models_per_class"])
            # multi-view train trees skip voxels (only the AE needs them);
            # the AE then pretrains on its own voxels-only synthetic set
            # with the same shape distribution (views don't matter to it)
            ae_ds = train_ds if "voxels" in train_ds.get(0) else None
            t0 = time.time()
            ae_out = train_autoencoder(ae_cfg, dataset=ae_ds)
            print(f"[run] AE done in {time.time()-t0:.0f}s: "
                  f"{json.dumps({k: float(v) for k, v in ae_out['metrics'].items()})}",
                  flush=True)
            encoder_dir = ae_cfg.checkpoint_dir

    from geometrics_tpu.train.trainer import train_geometrics

    preset_fn = PRESETS[args.preset]
    cfg = dataclasses.replace(
        preset_fn(args.run_dir, encoder_dir or "unused"),
        epochs=args.epochs, eval_every_epochs=args.eval_every,
        save_every_epochs=args.save_every or args.eval_every,
        eval_batch_size=args.eval_batch_size,
        steps_per_call=args.steps_per_call, learning_rate=args.lr,
        log_every=args.log_every,
        lr_schedule=args.lr_schedule,
        encoder_checkpoint=encoder_dir)
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.ema_decay >= 0.0:
        cfg = dataclasses.replace(cfg, ema_decay=args.ema_decay)
    cfg = dataclasses.replace(cfg, loss=dataclasses.replace(
        cfg.loss, edge=args.edge_w, laplacian=args.lap_w,
        laplacian_move=args.move_w,
        latent=cfg.loss.latent if args.with_latent else 0.0))

    t0 = time.time()
    result = train_geometrics(cfg, dataset=train_ds, test_dataset=test_ds,
                              max_steps=args.max_steps or None)
    print(f"[run] training done in {time.time()-t0:.0f}s", flush=True)

    ev = result["eval"]
    with open(os.path.join(args.run_dir, "eval.json"), "w") as fh:
        json.dump(ev, fh, indent=2)
    print(json.dumps({k: v for k, v in ev.items() if not isinstance(v, dict)}),
          flush=True)


if __name__ == "__main__":
    main()
