"""Test harness config: run everything on CPU with a virtual 8-device mesh.

SURVEY.md §4 item 6: multi-device paths are tested without a cluster via
XLA's host-platform device-count flag. Must be set before jax imports.
"""

import os

# Force CPU with 8 virtual devices. NOTE: this environment PRE-IMPORTS jax
# before user code runs, so setting JAX_PLATFORMS via os.environ here is too
# late — jax.config.update is the reliable override (backends are still
# uninitialized at conftest time). XLA_FLAGS is read lazily at backend init,
# so the env route still works for the device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# CBINFER_TPU_TESTS=1 keeps the real platform so @pytest.mark.tpu tests
# (perf smoke, SURVEY.md §4 item 7) can drive the chip:
#   CBINFER_TPU_TESTS=1 python -m pytest -m tpu tests/
if not os.environ.get("CBINFER_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU chip (run with "
        "CBINFER_TPU_TESTS=1, excluded from CPU CI)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("CBINFER_TPU_TESTS"):
        return
    skip = pytest.mark.skip(reason="TPU-only (set CBINFER_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    return jax.devices("cpu")
