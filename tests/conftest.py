"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding logic is validated
on host devices.  The axon sitecustomize pre-imports jax internals with
JAX_PLATFORMS=axon baked in, so the platform must be overridden through
jax.config (env vars are already captured by the time conftest runs)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(777)  # reference default seed (nnet-randomizer.h:41)
