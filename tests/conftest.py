"""Test harness config: run everything on CPU with a virtual 8-device mesh.

SURVEY.md §4 item 6: multi-device paths are tested without a cluster via
XLA's host-platform device-count flag. Must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    return jax.devices("cpu")
