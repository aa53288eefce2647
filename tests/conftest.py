"""Test env: force the CPU backend with 8 virtual devices so sharding
tests run anywhere (SURVEY.md §5: multi-host simulated via
xla_force_host_platform_device_count).

NOTE: on the axon image, sitecustomize.py imports jax and registers the
TPU backend before any user code runs, so setting JAX_PLATFORMS in
os.environ here is too late — we must go through jax.config (and set
XLA_FLAGS before the lazily-created CPU client comes up)."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)
