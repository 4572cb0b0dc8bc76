"""Deliberately probe the remote-TPU-worker envelope with a bounded run.

The shared relay worker crashes on oversized programs (CLAUDE.md), and
``validate_envelope`` refuses configs bigger than every probe that has
SURVIVED.  This tool runs a short, supervised-length slice of a preset with
``ignore_envelope`` set, and — if the worker survives it — records the
(program-size score, batch, steps_per_call) triple in the table the
validator reads (``record_probe`` → repo/.envelope_probes.json).

  python experiments/probe_envelope.py --preset paperres_xl \
      --data_root data/mv24 --probe_steps 120 [--steps_per_call 20]

Exit 0 = survived + recorded; a worker crash surfaces as the usual relay
exception / nonzero exit and records nothing.
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
class ProbeArgs:
    preset: str = "paperres_xl"
    data_root: str = "data/mv24"
    run_dir: str = "runs/envelope_probe"
    probe_steps: int = 120      # ~6 dispatch chunks at k=20 — long enough to
                                # catch the scan-length kills seen in round 2
    steps_per_call: int = 20
    batch_size: int = 0         # 0 = preset's
    adjacency: str = ""         # override model.adjacency_mode ("dense" |
                                # "pallas") — per-op timings through the relay
                                # ride a multi-ms dispatch floor, so the fair
                                # aggregation shoot-out is THIS probe's
                                # sec_per_step with each mode (round 4)
    name: str = ""              # probe-table label (default: the preset name)
    cpu: bool = False


def main() -> None:
    from geometrics_tpu.utils.cli import parse_into

    args = parse_into(ProbeArgs())
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geometrics_tpu.data.shapenet import PreparedDataset
    from geometrics_tpu.train.config import record_probe
    from geometrics_tpu.train.presets import PRESETS
    from geometrics_tpu.train.trainer import train_geometrics

    train_ds = PreparedDataset(args.data_root, "train")
    test_ds = PreparedDataset(args.data_root, "test")
    cfg = dataclasses.replace(
        PRESETS[args.preset](args.run_dir, "unused"),
        steps_per_call=args.steps_per_call, ignore_envelope=True,
        encoder_checkpoint=None, eval_every_epochs=10_000,
        save_every_epochs=10_000, resume=False)
    cfg = dataclasses.replace(cfg, loss=dataclasses.replace(
        cfg.loss, latent=0.0))
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.adjacency:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, adjacency_mode=args.adjacency))

    t0 = time.time()
    result = train_geometrics(cfg, dataset=train_ds, test_dataset=test_ds,
                              max_steps=args.probe_steps)
    dt = time.time() - t0
    total = float(result["metrics"]["total"])
    assert total == total, "probe produced NaN loss"

    record_probe(cfg, name=args.name or args.preset,
                 steps_survived=args.probe_steps)
    print(json.dumps({
        "probe": args.name or args.preset,
        "score": cfg.mesh.v_max * cfg.model.hidden,
        "batch": cfg.batch_size, "steps_per_call": cfg.steps_per_call,
        "probe_steps": args.probe_steps, "seconds": round(dt, 1),
        "sec_per_step": round(dt / max(args.probe_steps, 1), 3),
        "final_total": total, "recorded": True,
    }), flush=True)


if __name__ == "__main__":
    main()
