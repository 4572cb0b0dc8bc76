"""One-shot run monitor: progress + ETA to --max_steps from the metrics log.

  python experiments/watch_run.py --run_dir runs/xl1 --max_steps 100386

Reads the trainer's ``train_metrics.jsonl`` (reference analog: the stdout
loss prints, SURVEY.md §3.4 — here they are structured and monitorable),
estimates the steady-state step rate from the most recent log entries of the
CURRENT trainer process (wall_s resets on relaunch, so only the latest
monotone wall_s segment is used), and prints one JSON line with the rate,
the latest eval, and the ETA.  Exit code 1 if the log is stale (no new entry
for --stale_secs) so shell loops can alert.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclasses.dataclass(frozen=True)
class WatchArgs:
    run_dir: str = "runs/xl1"
    max_steps: int = 0      # 0 = no ETA, just rate + latest eval
    window: int = 6         # log entries used for the rate estimate
    stale_secs: float = 1800.0


def load_rows(path: str):
    rows = []
    with open(path) as fh:
        for line in fh:
            try:
                rows.append(json.loads(line))
            except ValueError:
                continue
    return rows


def current_segment(rows):
    """Rows since the last wall_s reset (trainer relaunch/resume)."""
    seg = []
    last_wall = None
    for r in rows:
        w = r.get("wall_s")
        if w is None:
            continue
        if last_wall is not None and w < last_wall:
            seg = []
        seg.append(r)
        last_wall = w
    return seg


def main() -> None:
    from geometrics_tpu.utils.cli import parse_into

    args = parse_into(WatchArgs())
    path = os.path.join(args.run_dir, "train_metrics.jsonl")
    rows = load_rows(path)
    if not rows:
        raise SystemExit(f"no rows in {path}")

    seg = [r for r in current_segment(rows) if r.get("step", 0) > 0]
    evals = [r for r in rows if "eval_mean_f1_tau" in r]
    out = {"run_dir": args.run_dir, "step": seg[-1]["step"] if seg else None}

    if len(seg) >= 2:
        w = seg[-min(args.window, len(seg)):]
        dstep = w[-1]["step"] - w[0]["step"]
        dwall = w[-1]["wall_s"] - w[0]["wall_s"]
        rate = dstep / dwall if dwall > 0 else 0.0
        out["steps_per_sec"] = round(rate, 3)
        if args.max_steps and rate > 0:
            remaining = max(0, args.max_steps - w[-1]["step"])
            out["remaining_steps"] = remaining
            out["eta_s"] = round(remaining / rate)
            out["eta_utc"] = time.strftime(
                "%H:%M:%S", time.gmtime(time.time() + remaining / rate))
    if evals:
        e = evals[-1]
        out["last_eval"] = {k: round(float(e[k]), 4) for k in
                            ("eval_mean_f1_tau", "eval_mean_f1_2tau",
                             "eval_mean_chamfer") if k in e}
        out["last_eval"]["step"] = e["step"]

    age = time.time() - os.path.getmtime(path)
    out["log_age_s"] = round(age)
    print(json.dumps(out))
    if age > args.stale_secs:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
