"""Render an eval JSON's per-class block as a markdown table (paper Table 1
shape: per-class + mean F1@τ / F1@2τ / Chamfer — SURVEY.md §3.4).

  python experiments/per_class_table.py runs/hr4/eval.json [--sort f1_tau]
"""

from __future__ import annotations

import argparse
import json


def render(ev: dict, sort_key: str = "") -> str:
    per_class = ev.get("per_class", {})
    if not per_class:
        return "(no per_class block in eval json)"
    cols = ["f1_tau", "f1_2tau", "chamfer"]
    rows = list(per_class.items())
    if sort_key:
        rows.sort(key=lambda kv: kv[1].get(sort_key, 0.0))
    lines = ["| class | F1@τ | F1@2τ | Chamfer |", "|---|---|---|---|"]
    for name, m in rows:
        lines.append(
            f"| {name} | {m.get('f1_tau', 0.0):.3f} "
            f"| {m.get('f1_2tau', 0.0):.3f} | {m.get('chamfer', 0.0):.5f} |")
    lines.append(
        f"| **mean** | **{ev.get('mean_f1_tau', 0.0):.3f}** "
        f"| **{ev.get('mean_f1_2tau', 0.0):.3f}** "
        f"| **{ev.get('mean_chamfer', 0.0):.5f}** |")
    return "\n".join(lines)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("eval_json")
    p.add_argument("--sort", default="f1_tau",
                   help="per-class sort column ('' keeps json order)")
    args = p.parse_args()
    with open(args.eval_json) as fh:
        ev = json.load(fh)
    print(render(ev, args.sort))


if __name__ == "__main__":
    main()
