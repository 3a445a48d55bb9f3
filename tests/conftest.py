"""Test harness: force an 8-device virtual CPU mesh before any backend init.

Mirrors the SURVEY §4 guidance — multi-chip sharding logic is validated on a
virtual CPU mesh (`--xla_force_host_platform_device_count`), which the PyTorch
reference has no equivalent of.

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so plain env vars are too late for the platform choice; we use
``jax.config.update`` instead, which works as long as no backend has been
initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent CPU compile cache for the suite: golden/e2e chunks are dominated
# by jit compiles of identical tiny models across fresh processes (measured
# r4: torch mirrors are cheap; XLA compiles are the wall time). Same-machine
# only, so the cross-host SIGILL concern from utils/compile_cache doesn't
# apply. Opt out with AIT_NO_TEST_COMPILE_CACHE=1.
if not os.environ.get("AIT_NO_TEST_COMPILE_CACHE"):
    _cache = os.path.expanduser("~/.cache/ait_test_compile")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

import pytest  # noqa: E402

# Tiering (SURVEY §4): goldens gate numerics, e2e gates lifecycle, everything
# else is the fast tier. Auto-marked by filename so new golden files join the
# tier without bookkeeping; `make test-fast` runs `-m "not golden and not e2e"`.
_GOLDEN_EXTRA = {
    "test_lpips.py", "test_dfe.py", "test_ltx_audio_vae.py", "test_ltx_vocoder.py",
    "test_dit_importers.py", "test_qwen_import.py", "test_mage_vae_golden.py",
}
_E2E_FILES = {"test_e2e.py", "test_ui_bridge.py"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _E2E_FILES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.e2e)
        elif "golden" in fname or fname in _GOLDEN_EXTRA:
            item.add_marker(pytest.mark.golden)


@pytest.fixture(scope="session")
def mesh8():
    from ai_toolkit_tpu.config.modules import MeshConfig
    from ai_toolkit_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest failed to create 8 virtual devices"
    return make_mesh(MeshConfig(axes={"dp": 2, "fsdp": 4, "tp": 1}))
