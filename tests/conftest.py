"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container's sitecustomize registers a remote-TPU ("axon") PJRT backend in
every interpreter when PALLAS_AXON_POOL_IPS is set, and JAX_PLATFORMS=axon is
exported globally; blanking both before jax import selects the in-process CPU
backend (fast, supports --xla_force_host_platform_device_count for multi-chip
sharding tests).
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
assert "jax" not in sys.modules, (
    "jax imported before conftest set the platform env vars"
)

os.environ.setdefault("COBAYA_TPU_STRICT_TYPES", "1")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path / "chains" / "test")
