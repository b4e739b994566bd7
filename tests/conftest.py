"""Test harness config.

All tests run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4: `XLA_FLAGS
--xla_force_host_platform_device_count=8` mesh tests).  Env vars must be set
before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
    """Return (xml_path, bin_path); synthesizes a deterministic .bin into
    assets/ when the reference blob is stripped."""
    xml = os.path.join(REFERENCE_MODELS, f"{name}.xml")
    real_bin = os.path.join(REFERENCE_MODELS, f"{name}.bin")
    if os.path.exists(real_bin):
        return xml, real_bin
    os.makedirs(ASSETS, exist_ok=True)
    synth_bin = os.path.join(ASSETS, f"{name}.bin")
    if not os.path.exists(synth_bin):
        from pyopenvino_tpu.ir import read_ir_model
        from tools.gen_weights import generate_weights

        model = read_ir_model(xml, weights_path="/nonexistent")
        with open(synth_bin, "wb") as f:
            f.write(generate_weights(model))
    return xml, synth_bin


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
