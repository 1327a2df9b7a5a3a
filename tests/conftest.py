"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated with
``--xla_force_host_platform_device_count=8`` (the fake-backend strategy from
SURVEY.md §4); real-TPU behavior is exercised by ``bench.py`` and the driver's
compile checks.

NOTE: the ambient environment registers an experimental TPU plugin that
overrides ``JAX_PLATFORMS`` from the environment, so we must force the
platform through ``jax.config`` before any backend is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
