"""Test harness: force an 8-device virtual CPU mesh before jax is imported.

Mirrors the SURVEY §4 guidance — multi-chip sharding logic is validated on a
virtual CPU mesh (`--xla_force_host_platform_device_count`), which the PyTorch
reference has no equivalent of.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from ai_toolkit_tpu.parallel.mesh import make_mesh
    from ai_toolkit_tpu.config.modules import MeshConfig

    assert len(jax.devices()) == 8, "conftest failed to create 8 virtual devices"
    return make_mesh(MeshConfig(axes={"dp": 2, "fsdp": 4, "tp": 1}))
