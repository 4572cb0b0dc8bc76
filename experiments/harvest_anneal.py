"""Harvest a completed cosine anneal before a hard deadline (endgame tool).

The lr schedule is stateless — re-derived from ``epochs × steps_per_epoch``
with the position taken from the restored optimizer count — so resuming the
SAME run_dir with a smaller ``--epochs`` (+ matching ``--max_steps``) drops
the lr onto the shortened schedule and anneals it to the floor by the
deadline (CLAUDE.md; used for runs/hr4 in round 3 via a hand-written
script).  A later round can resume with the original ``--epochs`` to
re-extend, SGDR-style.  Reaching ``--max_steps`` exits rc 0 with a final
eval, so the supervisor shuts down cleanly on its own.

This tool does the arithmetic from the run's latest checkpoint and execs
the bounded supervisor+trainer:

  python experiments/harvest_anneal.py --run_dir runs/xl1 \
      --data_root data/mv24 --preset paperres_xl --extra_epochs 3 \
      --max_hours 0.7

steps_per_epoch for the SCHEDULE is ``train_samples // batch`` (what the
trainer derives); the executed epoch is ceil-to-k dispatches longer, which
is why the target is computed from the schedule's value, not the executed
one.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclasses.dataclass(frozen=True)
class HarvestArgs:
    run_dir: str = "runs/xl1"
    data_root: str = "data/mv24"
    preset: str = "paperres_xl"
    extra_epochs: int = 3    # anneal length after the latest checkpoint
    max_hours: float = 0.7   # supervisor wall-clock bound (nothing may hold
                             # the chip at round end)
    commit_every: int = 1200  # supervisor-owned reboot insurance (r5)
    stall_secs: float = 1500.0
    startup_grace_secs: float = 1800.0
    max_restarts: int = 3
    reuse_ae: str = "runs/hr1/ae"
    eval_batch_size: int = 48
    dry_run: bool = False    # print the command instead of exec'ing it


def latest_checkpoint_step(run_dir: str) -> int:
    steps = [int(d) for d in os.listdir(run_dir)
             if d.isdigit() and os.path.isdir(os.path.join(run_dir, d))]
    if not steps:
        raise SystemExit(f"no numeric checkpoint dirs under {run_dir}")
    return max(steps)


def main() -> None:
    from geometrics_tpu.utils.cli import parse_into

    args = parse_into(HarvestArgs())
    with open(os.path.join(args.run_dir, "config.json")) as fh:
        cfg = json.load(fh)
    batch = int(cfg["batch_size"])
    k = int(cfg.get("steps_per_call", 1))

    from geometrics_tpu.data.shapenet import PreparedDataset

    n_train = len(PreparedDataset(args.data_root, "train"))
    steps_per_epoch = n_train // batch

    step = latest_checkpoint_step(args.run_dir)
    # resume restarts from the checkpoint, so the shortened schedule must
    # leave >= extra_epochs of running room past it
    epochs_short = step // steps_per_epoch + args.extra_epochs
    max_steps = epochs_short * steps_per_epoch

    cmd = [
        sys.executable, "experiments/supervise.py",
        "--run_dir", args.run_dir,
        "--stall_secs", str(args.stall_secs),
        "--startup_grace_secs", str(args.startup_grace_secs),
        "--max_restarts", str(args.max_restarts),
        "--max_hours", str(args.max_hours),
        "--commit_every", str(args.commit_every), "--",
        sys.executable, "experiments/run_full.py",
        "--run_dir", args.run_dir, "--data_root", args.data_root,
        "--preset", args.preset,
        "--epochs", str(epochs_short), "--max_steps", str(max_steps),
        "--with_latent", "true", "--reuse_ae", args.reuse_ae,
        "--steps_per_call", str(k),
        "--lr", str(cfg.get("learning_rate", 3e-4)),
        "--lr_schedule", cfg.get("lr_schedule", "cosine"),
        "--eval_every", "1", "--save_every", "1",
        "--eval_batch_size", str(args.eval_batch_size),
        "--log_every", "1000",
    ]
    print(json.dumps({"checkpoint_step": step,
                      "steps_per_epoch": steps_per_epoch,
                      "epochs_short": epochs_short, "max_steps": max_steps}),
          flush=True)
    if args.dry_run:
        print(" ".join(cmd))
        return
    os.execv(sys.executable, cmd)


if __name__ == "__main__":
    main()
