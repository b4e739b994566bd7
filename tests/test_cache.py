"""CACHE_DIR model cache (runtime/cache.py): compiled programs persist to
disk and a fresh compilation (cleared in-memory caches) is served from it.
"""

import numpy as np
import pytest

from tests.conftest import model_paths


def test_cache_dir_populates_and_serves(tmp_path):
    import jax

    from pyopenvino_tpu import Core
    from pyopenvino_tpu.runtime.cache import cache_entries, disable_model_cache

    cache = str(tmp_path / "blob_cache")
    try:
        core = Core()
        core.set_property({"CACHE_DIR": cache})
        net = core.read_model(*model_paths("mnist"))
        compiled = core.compile_model(net, "TPU")
        blob = np.zeros((1, 1, 28, 28), np.float32)
        name = net.inputs[0]["name"]
        out1 = compiled({name: blob})
        entries = cache_entries(cache)
        assert entries, "compile produced no persistent cache entries"

        # a fresh compile (in-memory jit caches dropped) must still work
        # and must not shrink the cache — it is served from disk
        jax.clear_caches()
        compiled2 = core.compile_model(core.read_model(*model_paths("mnist")))
        out2 = compiled2({name: blob})
        k = next(iter(out1))
        np.testing.assert_allclose(out1[k], out2[k], rtol=1e-5, atol=1e-6)
        assert len(cache_entries(cache)) >= len(entries)
    finally:
        disable_model_cache()


def test_unknown_config_key_fails_fast():
    import pytest

    from pyopenvino_tpu import IECore

    with pytest.raises(ValueError):
        IECore().set_config({"NOT_A_KEY": 1})


def test_get_config_get_property_roundtrip(tmp_path):
    """ie.get_config / core.get_property read back CACHE_DIR, and the 2.0
    get_property also answers device metrics."""
    from pyopenvino_tpu import Core, IECore

    ie = IECore()
    path = str(tmp_path / "cache")
    ie.set_config({"CACHE_DIR": path})
    try:
        import os

        assert ie.get_config("TPU", "CACHE_DIR") == os.path.abspath(path)
        core = Core()
        assert core.get_property("TPU", "CACHE_DIR") == os.path.abspath(path)
        devs = core.get_property("TPU", "AVAILABLE_DEVICES")
        assert isinstance(devs, list) and len(devs) >= 1
        assert "CPU" in core.get_property("TPU", "FULL_DEVICE_NAME").upper()
    finally:
        ie.set_config({"CACHE_DIR": ""})
    assert ie.get_config("TPU", "CACHE_DIR") == ""
    with pytest.raises(ValueError, match="unsupported"):
        ie.get_metric("TPU", "NOT_A_METRIC")
