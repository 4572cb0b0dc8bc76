"""Pin experiments/kernel_proof.py — the on-chip Pallas-dispatch proof tool.

Round-3 verdict found the kernels had never dispatched compiled on hardware;
kernel_proof.py is the round-4 instrument that proves they do.  This smoke
runs its full check sequence on CPU (interpret kernels, tiny shapes) so a
script rot (import, shape, or emit-format break) is caught before it wastes
a chip claim.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_kernel_proof_cpu_smoke():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device is fine here
    res = subprocess.run(
        [sys.executable, os.path.join("/root/repo", "experiments",
                                      "kernel_proof.py"),
         "--cpu", "--small", "--steps", "1", "--warmup", "0"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo")
    assert res.returncode == 0, f"kernel_proof failed:\n{res.stderr[-2000:]}"
    checks = {}
    for line in res.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
            checks[rec.pop("check")] = rec
    # every proof stage emitted, in a driver-parseable shape
    for expected in ("backend", "hlo_custom_call", "chamfer_equiv_flagship",
                     "chamfer_grad_equiv", "chamfer_time", "spmm", "done"):
        assert expected in checks, f"missing check {expected}: {checks}"
    assert checks["done"]["ok"] is True
    assert checks["chamfer_equiv_flagship"]["max_rel_err"] < 1e-4
    assert checks["chamfer_grad_equiv"]["max_abs_err"] < 1e-3
    assert checks["spmm"]["err_pallas_vs_f64"] < 2e-2
    assert checks["spmm"]["err_dense_vs_f64"] < 2e-2
