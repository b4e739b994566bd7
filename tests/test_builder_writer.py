"""IR writer + graph builder tests.

Roundtrip invariants: a parsed model serializes (ir/writer.py) and
re-parses to an identical graph producing identical outputs; a
programmatically-built graph (ir/builder.py) passes the same declared-shape
cross-checks as Model-Optimizer output and runs on every backend.
"""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.ir.writer import serialize_ir
from pyopenvino_tpu.ir.xml_parser import parse_ir
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter
from tests.conftest import model_paths


class TestWriterRoundtrip:
    def test_mnist_roundtrip_identical(self, mnist_image):
        xml, binp = model_paths("mnist")
        m1 = read_ir_model(xml, binp)
        xml_bytes, bin_bytes = serialize_ir(m1)
        m2 = parse_ir(xml_bytes.decode("utf-8"), bin_bytes)

        assert set(m1.nodes) == set(m2.nodes)
        for nid in m1.nodes:
            a, b = m1.nodes[nid], m2.nodes[nid]
            assert (a.op_type, a.name) == (b.op_type, b.name)
            assert {p: i.shape for p, i in a.outputs.items()} == {
                p: i.shape for p, i in b.outputs.items()
            }
            if a.const is not None:
                np.testing.assert_array_equal(a.const, b.const)
        assert len(m1.edges) == len(m2.edges)

        o1 = compile_model(m1)({"conv2d_input": mnist_image})
        o2 = compile_model(m2)({"conv2d_input": mnist_image})
        for k in o1:
            np.testing.assert_array_equal(o1[k], o2[k])

    def test_googlenet_roundtrip_shapes(self, loaded):
        m1 = loaded("googlenet-v1")
        xml_bytes, bin_bytes = serialize_ir(m1)
        m2 = parse_ir(xml_bytes.decode("utf-8"), bin_bytes)
        from pyopenvino_tpu.passes.shape_infer import (
            check_against_declared, infer_shapes,
        )

        check_against_declared(m2, infer_shapes(m2))


class TestBuilder:
    def _small_cnn(self, rng):
        b = GraphBuilder("tiny")
        x = b.parameter("in", (1, 3, 8, 8))
        w = b.const(rng.standard_normal((4, 3, 3, 3)).astype(np.float32))
        y = b.conv2d(x, w, pads=((1, 1), (1, 1)))
        y = b.relu(b.add(y, b.const(
            rng.standard_normal((1, 4, 1, 1)).astype(np.float32))))
        y = b.max_pool(y)
        y = b.reshape(y, (1, 64))
        y = b.matmul(y, b.const(
            rng.standard_normal((64, 5)).astype(np.float32)))
        y = b.softmax(y, axis=1)
        b.result(y, "out")
        return b.build()

    def test_built_graph_shape_checked(self):
        model = self._small_cnn(np.random.default_rng(0))
        from pyopenvino_tpu.passes.shape_infer import (
            check_against_declared, infer_shapes,
        )

        check_against_declared(model, infer_shapes(model))

    def test_built_graph_runs_all_backends(self):
        rng = np.random.default_rng(0)
        model = self._small_cnn(rng)
        x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)

        ref = Interpreter(model).run({"in": x})
        for backend in (Backend.XLA, Backend.PALLAS):
            out = compile_model(model, Config(backend=backend))({"in": x})
            for k in ref:
                np.testing.assert_allclose(
                    out[k], ref[k], rtol=1e-4, atol=1e-5
                )

    def test_built_graph_serializes_and_reloads(self, tmp_path):
        rng = np.random.default_rng(1)
        model = self._small_cnn(rng)
        from pyopenvino_tpu.ir.writer import write_ir_model

        xml_path = str(tmp_path / "tiny.xml")
        write_ir_model(model, xml_path)
        m2 = read_ir_model(xml_path)
        x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        o1 = compile_model(model)({"in": x})
        o2 = compile_model(m2)({"in": x})
        for k in o1:
            np.testing.assert_array_equal(o1[k], o2[k])


class TestTrainerExport:
    """The trainer's export path with random (untrained) params — the full
    train loop is exercised by tools/mnist_train.py itself."""

    def test_export_reload_parity(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from tools.mnist_train import export_ir, forward, init_params

        params = init_params(np.random.default_rng(0))
        xml_path = str(tmp_path / "m.xml")
        export_ir(params, xml_path)

        m = read_ir_model(xml_path)
        rng = np.random.default_rng(2)
        blob = rng.uniform(0, 255, (1, 1, 28, 28)).astype(np.float32)
        out = compile_model(m)({"conv2d_input": blob})
        probs = next(iter(out.values())).reshape(-1)

        ref = np.asarray(
            jax.nn.softmax(forward(params, jnp.asarray(blob / 255.0)))
        ).reshape(-1)
        np.testing.assert_allclose(probs, ref, rtol=1e-4, atol=1e-5)


def test_roundtrip_yolo_family(tmp_path):
    """The yolo-tiny family (RegionYolo, PReLU, stride-1 'same' pool)
    serializes through the writer and re-parses bit-identically."""
    import numpy as np

    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter
    from tools.gen_yolo import build_yolo_tiny

    m = build_yolo_tiny()
    p = str(tmp_path / "yolo.xml")
    write_ir_model(m, p)
    m2 = read_ir_model(p)
    blob = np.random.default_rng(0).uniform(
        0, 255, (1, 3, 160, 160)).astype(np.float32)
    a = Interpreter(m).run({"data": blob})
    b = Interpreter(m2).run({"data": blob})
    k = next(iter(a))
    np.testing.assert_array_equal(a[k], b[k])


def test_roundtrip_nms_graph(tmp_path):
    """NonMaxSuppression's three outputs (incl. the i32 indices ports)
    survive the writer/parser round trip exactly."""
    import numpy as np

    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter
    from tests.test_yolo import _nms_model, _rand_nms_inputs

    m = _nms_model(12, 3, n=2, max_boxes=4, iou_threshold=0.5,
                   score_threshold=0.2)
    p = str(tmp_path / "nms.xml")
    write_ir_model(m, p)
    m2 = read_ir_model(p)
    boxes, scores = _rand_nms_inputs(0, 2, 12, 3)
    a = Interpreter(m).run({"boxes": boxes, "scores": scores})
    b = Interpreter(m2).run({"boxes": boxes, "scores": scores})
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
