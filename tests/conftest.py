"""Test harness config.

All tests run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4: `XLA_FLAGS
--xla_force_host_platform_device_count=8` mesh tests).  Env vars must be set
before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Force the virtual device count to exactly 8 — an inherited
# host_platform_device_count (e.g. =4 from a debugging shell) would fail
# every MeshConfig(data=4, model=2) test far from the cause.
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags)

# The environment's sitecustomize imports jax at interpreter startup (before
# this conftest), so the env vars alone are too late — reconfigure the
# already-imported module before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MODELS = "/root/reference/models"
REFERENCE_RESOURCES = "/root/reference/resources"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "assets")

MODEL_NAMES = ["mnist", "mnist_bn", "googlenet-v1", "ssd_mobilenet_v1_coco"]


def model_paths(name: str):
    """Return (xml_path, bin_path) — delegates to the single
    implementation in __graft_entry__ so tests get the same
    GENERATOR_VERSION sidecar staleness check as every other harness
    (a forked copy here once skipped it, silently running tests on
    stale synthetic weights after a generator bump)."""
    from __graft_entry__ import _model_paths

    return _model_paths(name)


@pytest.fixture(scope="session")
def mnist_image():
    """The reference's MNIST test image as the raw 0-255 float blob
    (reference: test_pyopenvino.py:19-21)."""
    import cv2

    img = cv2.imread(os.path.join(REFERENCE_RESOURCES, "mnist2.png"))
    blob = cv2.split(img)[0].reshape(1, 1, 28, 28).astype(np.float32)
    return blob


@pytest.fixture(scope="session")
def loaded(request):
    """Cache of parsed models across tests."""
    cache = {}

    def get(name):
        if name not in cache:
            from pyopenvino_tpu.ir import read_ir_model

            xml, binp = model_paths(name)
            cache[name] = read_ir_model(xml, binp)
        return cache[name]

    return get
