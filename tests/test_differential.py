"""Differential testing: the compiled XLA path must agree with the numpy
interpreter on every model (the TPU-build version of the reference's
per-layer expected_result comparison, SURVEY.md §4.2 — here end-to-end over
real or synthesized weights)."""

import numpy as np
import pytest

from pyopenvino_tpu import IECore
from tests.conftest import MODEL_NAMES, model_paths

INPUT_SHAPES = {
    "mnist": ("conv2d_input", (1, 1, 28, 28)),
    "mnist_bn": ("conv2d_input", (1, 1, 28, 28)),
    "googlenet-v1": ("data", (1, 3, 224, 224)),
    "ssd_mobilenet_v1_coco": ("image_tensor", (1, 3, 300, 300)),
}


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_interpreter_vs_xla(name):
    ie = IECore()
    xml, binp = model_paths(name)
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU")

    input_name, shape = INPUT_SHAPES[name]
    rng = np.random.default_rng(42)
    blob = rng.uniform(0, 255, size=shape).astype(np.float32)

    exe.kernel_type = "interpreter"
    ref = exe.infer({input_name: blob})
    exe.kernel_type = "xla"
    got = exe.infer({input_name: blob})

    assert set(ref) == set(got)
    for k in ref:
        if name == "ssd_mobilenet_v1_coco":
            # detection records: compare detections while both lists agree;
            # tiny float divergence may flip a borderline NMS/threshold
            # decision deep in the list, so compare the common prefix
            ref_r, got_r = ref[k].reshape(-1, 7), got[k].reshape(-1, 7)
            n = 0
            while n < len(ref_r) and ref_r[n, 0] == n and got_r[n, 0] == n:
                np.testing.assert_allclose(
                    got_r[n], ref_r[n], rtol=5e-2, atol=1e-3
                )
                n += 1
            # at minimum the first record (detection or terminator) matches
            np.testing.assert_allclose(
                got_r[0], ref_r[0], rtol=5e-2, atol=1e-3
            )
        else:
            np.testing.assert_allclose(got[k], ref[k], rtol=2e-2, atol=1e-4)
