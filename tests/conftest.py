"""Test harness: force CPU with 8 virtual devices BEFORE jax is imported.

SURVEY.md §5.2-3: the TPU-native analog of a fake multi-node backend is an
8-device host-platform mesh; all unit/parity tests run on CPU so the suite
is hermetic and fast (the attached TPU is reserved for bench.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU PJRT plugin programmatically,
# which overrides JAX_PLATFORMS from the environment — force it at the
# config level too (verified: this wins and yields 8 CPU devices).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
