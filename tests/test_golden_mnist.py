"""Golden end-to-end tests on the one model with real shipped weights.

Mirrors the reference regression suite's MNIST assertion: top-3 class order
[2, 0, 1] for resources/mnist2.png (reference: integrity_test.py:57), checked
on both backends plus the INT8 weight-only path (accuracy gate: same top-1).
"""

import numpy as np
import pytest

from pyopenvino_tpu import Config, IECore
from pyopenvino_tpu.config import Backend, QuantMode
from tests.conftest import model_paths

EXPECTED_TOP3 = [2, 0, 1]


@pytest.fixture(scope="module")
def mnist_net():
    ie = IECore()
    xml, binp = model_paths("mnist")
    return ie, ie.read_network(xml, binp)


def _top3(res, net):
    out_name = net.outputs[0]["name"]
    return list(np.argsort(res[out_name][0])[::-1][:3])


def test_interpreter_golden(mnist_net, mnist_image):
    ie, net = mnist_net
    exe = ie.load_network(net, "CPU")
    assert exe.backend == Backend.INTERPRETER
    res = exe.infer({"conv2d_input": mnist_image})
    assert _top3(res, net) == EXPECTED_TOP3


def test_xla_golden(mnist_net, mnist_image):
    ie, net = mnist_net
    exe = ie.load_network(net, "TPU")
    res = exe.infer({"conv2d_input": mnist_image})
    assert _top3(res, net) == EXPECTED_TOP3


def test_kernel_type_compat(mnist_net, mnist_image):
    """The reference's kernel_type strings still select backends
    (reference: README.md:133-136)."""
    ie, net = mnist_net
    exe = ie.load_network(net, "TPU")
    exe.kernel_type = "naive"
    assert exe.backend == Backend.INTERPRETER
    res_naive = exe.infer({"conv2d_input": mnist_image})
    exe.kernel_type = "special"
    assert exe.backend == Backend.XLA
    res_special = exe.infer({"conv2d_input": mnist_image})
    out = net.outputs[0]["name"]
    np.testing.assert_allclose(
        res_naive[out], res_special[out], rtol=1e-3, atol=1e-5
    )


def test_int8_weight_only_golden(mnist_net, mnist_image):
    ie, net = mnist_net
    cfg = Config(quant=QuantMode.INT8_WEIGHT)
    exe = ie.load_network(net, "TPU", config=cfg)
    res = exe.infer({"conv2d_input": mnist_image})
    out = net.outputs[0]["name"]
    # top-1 must survive quantization (BASELINE.md accuracy gate)
    assert int(np.argmax(res[out][0])) == EXPECTED_TOP3[0]


def test_interpreter_vs_xla_golden_outputs(mnist_net, mnist_image):
    """Differential on the golden image: compiled final outputs match the
    numpy interpreter.  (Per-layer activation comparison is covered by
    test_debug_api.py::test_verify_against_interpreter_passes.)"""
    ie, net = mnist_net
    exe = ie.load_network(net, "TPU")
    exe.kernel_type = "interpreter"
    ref = exe.infer({"conv2d_input": mnist_image})
    exe.kernel_type = "xla"
    got = exe.infer({"conv2d_input": mnist_image})
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)


def test_batched_inference(mnist_net, mnist_image):
    """vmap batch path: a batch of identical images yields identical rows."""
    ie, net = mnist_net
    exe = ie.load_network(net, "TPU")
    single = exe.infer({"conv2d_input": mnist_image})
    batch = np.repeat(mnist_image.reshape(1, 1, 28, 28), 4, axis=0)
    out = exe.infer_batch({"conv2d_input": batch})
    name = net.outputs[0]["name"]
    assert out[name].shape[0] == 4
    for b in range(4):
        np.testing.assert_allclose(
            out[name][b], single[name][0], rtol=1e-4, atol=1e-6
        )


def test_uint8_input_blobs(mnist_image):
    """Raw uint8 pixel blobs are accepted (the Parameter node casts
    on-device) — 4x less host->device transfer than float32 in serving."""
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    c = compile_model(read_ir_model(*model_paths("mnist")), Config())
    u8 = mnist_image.astype(np.uint8)
    o8 = c({"conv2d_input": u8})
    o32 = c({"conv2d_input": mnist_image})
    k = next(iter(o8))
    np.testing.assert_array_equal(o8[k], o32[k])
