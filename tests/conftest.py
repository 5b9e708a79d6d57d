"""Test config: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (the TPU-native analogue of testing
multi-node code without a cluster — the reference never does this,
SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

# The environment's sitecustomize force-registers the 'axon' TPU platform and
# overrides jax_platforms — undo that so tests run on 8 virtual CPU devices.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
