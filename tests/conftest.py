"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container's sitecustomize imports jax and registers a remote-TPU ("axon")
PJRT backend at interpreter startup, with JAX_PLATFORMS=axon exported
globally.  JAX backends initialize lazily, so overriding jax_platforms (and
the XLA host-device-count flag) here — before any test touches a device —
reliably selects an 8-virtual-device CPU backend.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("COBAYA_TPU_STRICT_TYPES", "1")

import jax  # noqa: E402

from jax._src import xla_bridge  # noqa: E402

assert not xla_bridge._backends, (
    "a JAX backend was initialized before conftest could select CPU"
)
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path / "chains" / "test")
