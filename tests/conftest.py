"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host platform devices
(``xla_force_host_platform_device_count``), mirroring how the driver
dry-runs the multi-chip path.  Must be set before JAX initializes.
"""

import os

# NUTPIE_TEST_PLATFORM=tpu runs the suite on the real accelerator (used to
# re-verify the statistical gates on hardware, f32); default is the CPU
# virtual mesh with x64.
_PLATFORM = os.environ.get("NUTPIE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM
os.environ.setdefault("XLA_FLAGS", "")
if _PLATFORM == "cpu" and (
    "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]
):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# jax may already have been imported (and platform chosen) by a
# sitecustomize that registers an accelerator plugin; force the platform
# via config, which works post-import as long as no backend initialized.
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# persistent compile cache: the jit programs are keyed by HLO, so repeated
# test runs (and repeated sample() calls with identical configs) skip XLA
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "pymc: tests requiring pymc")
    config.addinivalue_line("markers", "stan: tests of the Stan frontend")
    config.addinivalue_line("markers", "flow: tests of flow adaptation")
    config.addinivalue_line("markers", "slow: long-running tests")
    config.addinivalue_line(
        "markers",
        "gate: statistical acceptance gates -- re-run after any sampler/ "
        "adaptation change (python -m pytest -m gate)",
    )


@pytest.fixture
def seed():
    return 42
