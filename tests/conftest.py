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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables when a test module finishes.

    The full suite compiles thousands of XLA:CPU executables in one
    process; around test ~370 (~6 GB RSS) the accumulation segfaults
    XLA's native compiler mid-`backend_compile_and_load` (observed on
    tests/test_streaming_decode.py beam compiles — the same tests pass
    in isolation, so the crash is cumulative JIT state, not test
    logic).  Dropping the jit caches at module boundaries frees the
    loaded executables and keeps the single-invocation `pytest tests/`
    gate green; per-module recompiles of shared helpers are noise next
    to the suite's own compile load.
    """
    yield
    jax.clear_caches()
