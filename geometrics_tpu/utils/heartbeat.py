"""Liveness heartbeat for the stall watchdog (experiments/supervise.py).

The operative failure mode in this environment is a HUNG relay call: the
remote TPU worker stalls mid-dispatch and the training process blocks forever
inside a device call (round 2 lost the flagship quality run to the fourth
such incident in one night — RESULTS.md).  Python-side timeouts can't
interrupt a blocked XLA call, so recovery has to come from OUTSIDE the
process: the trainer touches a heartbeat file at every safe point (before
each dispatch / eval batch), and the supervisor kills + relaunches the run
when the file goes quiet.  Resume (orbax, params+opt+step) makes the restart
cheap.

No-op unless ``GEOMETRICS_HEARTBEAT_FILE`` is set (the supervisor sets it),
so normal runs pay nothing.
"""

from __future__ import annotations

import os
import time

ENV_VAR = "GEOMETRICS_HEARTBEAT_FILE"
_MIN_INTERVAL_S = 2.0
_last_beat = 0.0


def beat(tag: str = "") -> None:
    """Touch the heartbeat file (throttled; silent no-op when unset)."""
    global _last_beat
    path = os.environ.get(ENV_VAR)
    if not path:
        return
    now = time.monotonic()
    if now - _last_beat < _MIN_INTERVAL_S:
        return
    _last_beat = now
    try:
        with open(path, "w") as fh:
            fh.write(f"{time.time():.3f} {tag}\n")
    except OSError:
        pass
