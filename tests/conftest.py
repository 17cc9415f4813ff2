"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the JAX-native way to test sharded
programs is `--xla_force_host_platform_device_count` (see SURVEY.md §4).  These env
vars must be set before `import jax` anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's TPU tunnel plugin (sitecustomize) may have force-selected its
# platform via jax.config.update at interpreter start, which overrides env vars —
# override it back.  Tests always run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # `-m "not slow"` keeps the edit loop honest on the one-core host: the
    # slow set is the full-UNet parity/e2e recompiles (minutes each, cold)
    config.addinivalue_line(
        "markers", "slow: heavy XLA recompiles (full-UNet parity, e2e training)"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
