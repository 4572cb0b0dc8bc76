"""Test configuration: force CPU with 8 virtual devices (SURVEY.md §4.5).

The environment's sitecustomize pins ``JAX_PLATFORMS=axon`` (the tunneled TPU
chip) before any user code runs, so setting the env var here is too late —
``jax.config.update`` after import is the effective override.  Tests run on
the local 8-virtual-device CPU mesh: fast (no tunnel RPC per call) and it
exercises the ('data',) sharding logic; real-TPU smoke is covered by bench.py
/ __graft_entry__.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
