"""Test config: run on a virtual 8-device CPU mesh so sharding tests work
without real multi-chip hardware (SURVEY.md §4 test plan).

The environment pins JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize
hook registers the axon PJRT plugin at interpreter start, so the env var
alone cannot force CPU — use jax.config.update before any backend init.
Set ENERF_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("ENERF_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
