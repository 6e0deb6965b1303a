"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding logic is validated
on host devices (must run before jax is imported anywhere)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(777)  # reference default seed (nnet-randomizer.h:41)
