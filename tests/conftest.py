"""Test config: run everything on a virtual 8-device CPU mesh.

This environment force-registers a TPU backend via sitecustomize and presets
JAX_PLATFORMS=axon, so env vars alone don't stick — the jax.config updates
below are what actually pin the tests to 8 virtual CPU devices.
"""
import os

_USE_TPU = os.environ.get("SGCDET_TEST_TPU", "") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if not _USE_TPU:
    # run everything on a virtual 8-device CPU mesh
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_default_matmul_precision", "highest")
    # the axon sitecustomize monkeypatches backend init and, when its TPU
    # tunnel is down, can HANG (not error) inside make_c_api_client even
    # with jax_platforms=cpu — drop the factory so CPU tests never touch it
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

import pytest

# fast host-side modules (~6 min single-CPU total): `pytest -m quick` is the
# per-commit gate; the full suite (torch-parity + kernel tests, ~30 min)
# runs once per round
_QUICK_MODULES = {
    "test_nms", "test_indoor_eval", "test_boxes", "test_geometry",
    "test_golden_mmdet3d", "test_visibility_budget", "test_aux_paths",
    "test_bilinear_patch", "test_loader_workers", "test_use_depth_false",
    "test_config_overrides",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True)
def _reset_compute_dtype():
    """The compute-dtype knob is trace-time global (SGCDet sets it from its
    config on every trace); reset between tests so a bf16 model test doesn't
    leak into f32 layer-parity tests."""
    from sgcdet_tpu.models.layers import set_compute_dtype

    set_compute_dtype(None)
    yield
    set_compute_dtype(None)
