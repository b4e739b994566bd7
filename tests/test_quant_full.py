"""Full-INT8 (weights + calibrated activations) quantization tests.

Accuracy gate on real shipped MNIST weights: the INT8_FULL path must keep
the golden top-3 ranking [2, 0, 1] (reference: integrity_test.py:57) —
the BASELINE.md "top-1 within 0.5%" gate, checkable only where real
weights exist.
"""

import numpy as np
import pytest

from pyopenvino_tpu import IECore
from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from tests.conftest import model_paths


def _cal_samples(shape, n=4, include=None):
    rng = np.random.default_rng(0)
    out = list(include or [])
    for _ in range(n):
        out.append({
            name: rng.uniform(0, 255, s).astype(np.float32)
            for name, s in shape.items()
        })
    return out


class TestInt8Full:
    @pytest.mark.parametrize("backend", [Backend.XLA, Backend.PALLAS])
    def test_mnist_golden(self, backend, mnist_image):
        xml, binp = model_paths("mnist")
        m = read_ir_model(xml, binp)
        cal = _cal_samples(
            {"conv2d_input": (1, 1, 28, 28)},
            include=[{"conv2d_input": mnist_image}],
        )
        c = compile_model(
            m, Config(backend=backend, quant=QuantMode.INT8_FULL),
            calibration_samples=cal,
        )
        assert len(c.act_scales) >= 4  # 3 convs + matmuls get scales
        out = c({"conv2d_input": mnist_image})
        k = next(iter(out))
        assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]

    def test_googlenet_top1_matches_fp32(self, loaded):
        m = loaded("googlenet-v1")
        rng = np.random.default_rng(1)
        blob = rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)
        cal = [{"data": blob}]
        ref = compile_model(m, Config())({"data": blob})
        c = compile_model(
            m, Config(quant=QuantMode.INT8_FULL), calibration_samples=cal
        )
        out = c({"data": blob})
        k = next(iter(out))
        assert np.argmax(out[k]) == np.argmax(ref[k])

    def test_missing_calibration_rejected(self, loaded):
        with pytest.raises(ValueError, match="calibration"):
            compile_model(loaded("mnist"), Config(quant=QuantMode.INT8_FULL))

    def test_facade_set_calibration(self, mnist_image):
        ie = IECore()
        xml, binp = model_paths("mnist")
        net = ie.read_network(xml, binp)
        exe = ie.load_network(
            net, "TPU", config=Config(quant=QuantMode.INT8_FULL)
        )
        exe.set_calibration([{"conv2d_input": mnist_image}])
        out = exe.infer({"conv2d_input": mnist_image})
        k = next(iter(out))
        assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]


def test_int8_interlayer_storage_edges():
    """INT8-FULL assigns int8 HBM storage to conv->conv edges (the
    quantized dataflow: producer epilogue requantizes, consumer reads int8
    directly) and the stored-path output stays within quantization
    tolerance of fp32."""
    from pyopenvino_tpu.config import Backend, Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    xml, binp = model_paths("ssd_mobilenet_v1_coco")
    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (1, 3, 300, 300)).astype(np.float32)
    cal = [{"image_tensor": blob}]

    c = compile_model(
        read_ir_model(xml, binp),
        Config(backend=Backend.XLA, quant=QuantMode.INT8_FULL),
        calibration_samples=cal,
    )
    # the MobileNet trunk is conv->dw->conv chains: many edges qualify
    assert len(c._int8_edges) >= 20, len(c._int8_edges)

    ref = compile_model(
        read_ir_model(xml, binp), Config(backend=Backend.XLA)
    )({"image_tensor": blob})
    got = c({"image_tensor": blob})
    r = next(iter(ref.values())).reshape(-1, 7)
    g = next(iter(got.values())).reshape(-1, 7)
    assert r[0, 1] == g[0, 1]          # top detection class preserved
    assert abs(r[0, 2] - g[0, 2]) < 0.05


def test_int8_storage_mnist_golden(mnist_image):
    """MNIST golden top-3 survives the full quantized dataflow."""
    from pyopenvino_tpu.config import Backend, Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    xml, binp = model_paths("mnist")
    cal = [{"conv2d_input": mnist_image}]
    c = compile_model(
        read_ir_model(xml, binp),
        Config(backend=Backend.XLA, quant=QuantMode.INT8_FULL),
        calibration_samples=cal,
    )
    out = c({"conv2d_input": mnist_image})
    scores = next(iter(out.values())).reshape(-1)
    assert list(np.argsort(scores)[::-1][:3]) == [2, 0, 1]
