"""Test configuration: force CPU with 8 virtual devices (SURVEY.md §4.5).

Must run before jax is imported anywhere — pytest imports conftest first.
This exercises the ('data',) mesh sharding logic without TPU hardware; the
single-chip TPU smoke path is covered separately by bench.py / __graft_entry__.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
