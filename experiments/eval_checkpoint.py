"""Score a trained checkpoint: Chamfer + F1@τ/2τ, mean and per-class.

The reference's ``--eval`` path (SURVEY.md §3.4) as a standalone tool:

  python experiments/eval_checkpoint.py --run_dir runs/full_r1 \
      [--data_root data/synthetic_shapenet] [--split test] [--cpu true]

Reads ``<run_dir>/config.json`` (written by the trainer) to rebuild the exact
model, restores the latest checkpoint, and prints the eval JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class EvalArgs:
    run_dir: str = "runs/full_r1"
    data_root: str = "data/synthetic_shapenet"
    split: str = "test"
    batch_size: int = 13
    max_samples: int = 0   # 0 = the whole split; >0 = a uniform subset (e.g.
                           # train-split F1 for generalization-gap diagnosis)
    out_json: str = ""     # also write the eval dict here when set
    cached: bool = True    # device-cached eval (one upload + scanned batches:
                           # seconds instead of one relay round trip per
                           # batch; protocol-identical, no qualitative dumps).
                           # --cached false for the host-fed path with
                           # .obj dump batches (costs ~1 round trip/batch
                           # through the relay — minutes, not seconds)
    best: bool = False     # score <run_dir>/best (the best-eval retention
                           # snapshot) instead of the latest step
    cpu: bool = False


from geometrics_tpu.train.config import config_from_json  # noqa: E402 (re-export)


def main() -> None:
    from geometrics_tpu.utils.cli import parse_into

    args = parse_into(EvalArgs())
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from geometrics_tpu.data.shapenet import PreparedDataset
    from geometrics_tpu.train.config import EvalConfig
    from geometrics_tpu.train.trainer import (
        build_model, evaluate, evaluate_cached)
    from geometrics_tpu.utils.checkpoint import Checkpointer

    with open(os.path.join(args.run_dir, "config.json")) as fh:
        config = config_from_json(json.load(fh))
    model = build_model(config)

    ckpt = Checkpointer(os.path.join(args.run_dir, "best") if args.best
                        else args.run_dir)
    step = ckpt.latest_step()
    raw = ckpt.restore_raw(step)
    # EMA runs score their Polyak average (the tree evals/ckpts are built on)
    params = raw.get("ema") or raw["params"]
    which = "ema" if "ema" in raw else "params"
    print(f"[eval] restored step {step} ({which}) from {ckpt.directory}",
          flush=True)

    ds = PreparedDataset(args.data_root, args.split)
    indices = np.arange(len(ds))
    if args.max_samples and args.max_samples < len(ds):
        # linspace (not stride+truncate: that can drop whole trailing classes
        # of the class-ordered file list) keeps per-class balance
        indices = np.unique(np.linspace(0, len(ds) - 1,
                                        args.max_samples).astype(np.int64))
    eval_cfg = EvalConfig(batch_size=args.batch_size,
                          data_diameter=ds.diameter)
    if args.cached:
        result = evaluate_cached(params, model, config, ds, indices,
                                 eval_config=eval_cfg)
    else:
        result = evaluate(params, model, config, ds, indices,
                          eval_config=eval_cfg,
                          dump_meshes_to=os.path.join(args.run_dir,
                                                      "eval_samples"))
    result["split"] = args.split
    result["checkpoint_step"] = int(step)
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
