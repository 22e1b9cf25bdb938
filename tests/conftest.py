"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set the environment before the first ``import jax`` anywhere in the test
process so sharding tests can exercise real multi-device SPMD without TPU
hardware.
"""

import os

# stash the launch platform selection (e.g. "axon" for the tunneled TPU —
# experimental platforms are only picked when explicitly named) so the
# hardware-gated subprocess tests can restore it
if "PAWS_ORIG_JAX_PLATFORMS" not in os.environ and "JAX_PLATFORMS" in os.environ:
    os.environ["PAWS_ORIG_JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"]
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin registers itself via sitecustomize and pins
# JAX_PLATFORMS; the config update below wins because backends initialize
# lazily, so the suite runs on the virtual 8-device CPU mesh as intended.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
