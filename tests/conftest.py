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

# Persistent compilation cache: most of the suite's wall time is XLA-CPU
# compiles of jit programs that don't change between runs — with a warm
# cache the fast pass drops from ~6 min to well under the 5-minute budget.
# Opt out with VISUALBERT_JAX_CACHE=0 (e.g. when bisecting compiler flags).
from visualbert_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("/tmp/visualbert_test_jax_cache")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
