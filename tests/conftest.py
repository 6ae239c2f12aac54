"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding tests need several devices; real TPU hardware in this
environment exposes a single chip, so tests force the CPU backend with 8
virtual devices (the driver separately dry-run-compiles the multi-chip path
and benches on the real chip).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# tests run on the CPU backend with the persistent compile cache OFF:
# XLA:CPU AOT cache artifacts are stamped with compile-time machine
# features (+prefer-no-scatter etc.) that do not reliably match at load
# time, which SIGABRT/SIGSEGVs the process (observed round 4, twice).
# The TPU-path cache (mitsuba_tpu/__init__.py) is unaffected.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# NOTE: the env var JAX_PLATFORMS is pinned to "axon" (the TPU tunnel) by the
# environment's sitecustomize *before* any user code runs, so it can't be
# overridden via os.environ here — only via the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def np_rng():
    return np.random.default_rng(12345)
