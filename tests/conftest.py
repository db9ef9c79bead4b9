"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware (the same trick
the driver's dryrun uses)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS via
# jax.config — override it back so tests run on the 8-device virtual CPU
# mesh, not the remote chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


REFERENCE_GGUF_PY = "/root/reference/gguf-py"


@pytest.fixture(scope="session")
def reference_gguf(request):
    """Import the reference repo's gguf-py as a *test oracle* (data source for
    bit-exactness checks). Skips if unavailable. Never used by tpullm itself."""
    import sys

    if not os.path.isdir(REFERENCE_GGUF_PY):
        pytest.skip("reference gguf-py not available")
    if REFERENCE_GGUF_PY not in sys.path:
        sys.path.insert(0, REFERENCE_GGUF_PY)
    try:
        import gguf  # noqa: F401
        import gguf.quants  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference gguf-py not importable: {e}")
    return gguf
