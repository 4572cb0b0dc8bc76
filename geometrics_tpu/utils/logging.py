"""Structured metrics logging + profiler hooks (SURVEY.md §5 observability).

Reference: raw stdout prints of loss values + periodic .obj dumps.  Here:
per-step scalars go to a JSONL file AND stdout; `trace_annotation` wraps the
train step and each Pallas kernel region with named `jax.profiler` traces so
a perfetto dump attributes time correctly; mesh .obj dumps are kept
(core/mesh.py save_mesh_buffer_sample).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


class MetricsLogger:
    """Append-only JSONL scalar logger with stdout echo."""

    def __init__(self, log_dir: str, name: str = "metrics",
                 echo: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a")
        self.echo = echo
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, Any], **extra: Any) -> None:
        rec = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        # ONE device fetch for the whole dict: per-leaf np.asarray costs a
        # full host<->device round trip each (seconds over a remote relay)
        items = {**scalars, **extra}
        device_keys = [k for k, v in items.items() if hasattr(v, "device")]
        if device_keys:
            fetched = jax.device_get({k: items[k] for k in device_keys})
            items.update(fetched)
        for k, v in items.items():
            if hasattr(v, "item"):
                v = np.asarray(v)
                v = v.item() if v.ndim == 0 else v.tolist()
            rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.echo:
            terms = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k != "wall_s")
            print(f"[{rec['wall_s']:9.1f}s] {terms}", flush=True)

    def close(self) -> None:
        self._fh.close()


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named profiler region (shows up in perfetto/tensorboard traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def maybe_profile(out_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``out_dir`` when set (else no-op)."""
    if out_dir:
        jax.profiler.start_trace(out_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
