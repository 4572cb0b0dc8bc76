"""TPU-backend detection shared by the kernel dispatch layer.

The driver's tunneled chip registers a PJRT plugin whose *platform name* is
"axon", not "tpu" — so ``jax.default_backend() == "tpu"`` is False on the
real hardware (round-3 verdict: the Pallas kernels never dispatched on chip
because of exactly that string compare).  The robust probe is the device
kind ("TPU v5 lite" etc.), with the platform-name allowlist as fallback for
environments where the device kind is opaque.
"""

from __future__ import annotations

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu() -> bool:
    """True iff the default JAX backend executes on a real TPU.

    Checked in priority order: (1) the default backend's device kind
    mentions "tpu" (the ground truth — the axon relay's remote devices
    report a TPU device kind); (2) the platform name is a known TPU-backed
    platform ("tpu" natively, "axon" through the relay tunnel).
    """
    try:
        devs = jax.devices()
        if devs and "tpu" in str(getattr(devs[0], "device_kind", "")).lower():
            return True
    except Exception:
        pass
    try:
        return jax.default_backend() in _TPU_PLATFORMS
    except Exception:
        return False
