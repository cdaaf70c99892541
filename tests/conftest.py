"""Test harness config: force the CPU backend with 8 virtual devices so
sharding/halo-exchange tests run without a TPU pod (SURVEY.md §4.3), and keep
numerics deterministic.  Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# This machine's sitecustomize registers the remote-TPU ("axon") PJRT plugin
# and force-sets jax_platforms="axon,cpu" in every interpreter, overriding the
# env var — override it back before any backend is initialized so tests run
# on the local 8-virtual-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
