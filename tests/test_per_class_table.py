"""Tests for the per-class results-table renderer (experiments/per_class_table.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))

from per_class_table import render  # noqa: E402


def _ev():
    return {
        "mean_f1_tau": 0.2, "mean_f1_2tau": 0.4, "mean_chamfer": 0.001,
        "per_class": {
            "box": {"f1_tau": 0.1, "f1_2tau": 0.3, "chamfer": 0.002},
            "tube": {"f1_tau": 0.3, "f1_2tau": 0.5, "chamfer": 0.0005},
        },
    }


def test_renders_all_classes_and_mean_sorted():
    out = render(_ev(), sort_key="f1_tau")
    lines = out.splitlines()
    assert lines[0].startswith("| class ")
    body = [l for l in lines if l.startswith("| ") and "class" not in l
            and "---" not in l]
    # ascending by f1_tau: box (0.1) before tube (0.3), mean last
    assert body[0].startswith("| box ")
    assert body[1].startswith("| tube ")
    assert body[-1].startswith("| **mean** ") and "**0.200**" in body[-1]


def test_handles_missing_per_class():
    assert "no per_class" in render({"mean_f1_tau": 0.5})
