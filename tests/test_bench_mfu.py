"""Plausibility gating + peak lookup in bench.py (round-4 verdict #2).

BENCH_r04 shipped mfu=1.12 — >100% of a v5e's bf16 peak — as the official
artifact.  These tests pin the round-5 fix: per-window implied-FLOP/s checks
against the device kind's nominal peak, suspect-window exclusion from the
per-chip headline, and the analytic-flops basis all behave as documented,
with no hardware in the loop."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_peak_for_kind():
    peak, assumed = bench._peak_for_kind("TPU v5 lite")
    assert peak == 197e12 and not assumed
    peak, assumed = bench._peak_for_kind("TPU v5e")
    assert peak == 197e12 and not assumed
    peak, assumed = bench._peak_for_kind("TPU v5p")
    assert peak == 459e12 and not assumed
    peak, assumed = bench._peak_for_kind("TPU v4")
    assert peak == 275e12 and not assumed
    # opaque relay kind: assume v5e and SAY so
    peak, assumed = bench._peak_for_kind("weird-relay-device")
    assert peak == 197e12 and assumed


def test_gate_all_plausible():
    # 380 GFLOP/step at batch 32; 10k meshes/s -> 118.7 TFLOP/s -> mfu 0.60
    flops, batch, peak = 380e9, 32, 197e12
    mps, mfu, wmfu, suspect, plausible = bench._gate_windows(
        [9_000.0, 10_000.0, 11_000.0], flops, batch, peak)
    assert mps == 10_000.0
    assert suspect == [False, False, False]
    assert plausible == [9_000.0, 10_000.0, 11_000.0]
    assert mfu == pytest.approx(flops * mps / batch / peak)
    assert 0 < mfu < 1


def test_gate_excludes_impossible_windows():
    """The round-4 failure shape: one jackpot window implying ~1.9x peak
    must not become the per-chip headline."""
    flops, batch, peak = 380e9, 32, 197e12
    # rate crossing peak: 197e12*32/380e9 = 16,589 meshes/s
    mps, mfu, wmfu, suspect, plausible = bench._gate_windows(
        [12_000.0, 13_000.0, 31_950.0], flops, batch, peak)
    assert suspect == [False, False, True]
    assert mps == 12_500.0            # median of the two plausible windows
    assert mfu is not None and mfu < 1.0
    assert wmfu[2] > 1.9              # the jackpot really implies ~1.93x


def test_gate_no_plausible_windows():
    """All windows faster than one chip can be: report the median but with
    mfu=None so the payload is marked mfu_suspect (pool moment, not chip)."""
    flops, batch, peak = 380e9, 32, 197e12
    mps, mfu, wmfu, suspect, plausible = bench._gate_windows(
        [30_000.0, 31_000.0, 33_000.0], flops, batch, peak)
    assert all(suspect) and plausible == []
    assert mps == 31_000.0
    assert mfu is None
