"""The sixth model family: programmatic MobileNet-v2 (tools/gen_mobilenet.py).

First *classifier* exercising the depthwise stack end-to-end: inverted
residuals (1×1 expand → 3×3 depthwise → 1×1 linear project), ReLU6
(Clamp) activations, and residual adds around activation-free
bottlenecks — a Conv→Add (no trailing activation) → elementwise-Add
fusion pattern none of the other five models produce.  Also routes the
INT8-FULL inter-layer dataflow through depthwise convs in a
classification topology (SSD covers them only in the detection trunk)."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def mnet():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("mobilenet-v2")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)


def test_topology(mnet):
    # 17 inverted-residual blocks → 17 depthwise convs; 10 identity
    # residual adds around linear bottlenecks (n-1 per repeated stage).
    assert len(mnet.find_by_type("GroupConvolution")) == 17
    assert len(mnet.find_by_type("Clamp")) == 17 + 16 + 2  # dw + expand + stem/head


def test_interpreter_vs_xla(mnet, blob):
    ref = Interpreter(mnet).run({"data": blob})
    net = compile_model(mnet, Config(backend=Backend.XLA))
    got = net.infer({"data": blob})
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == (1, 1000)
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)
    assert abs(float(next(iter(got.values())).sum()) - 1.0) < 1e-3


def test_interpreter_vs_pallas(mnet, blob):
    ref = Interpreter(mnet).run({"data": blob})
    net = compile_model(mnet, Config(backend=Backend.PALLAS))
    got = net.infer({"data": blob})
    k = next(iter(ref))
    np.testing.assert_allclose(got[k], ref[k], rtol=2e-3, atol=1e-4)


def test_int8_modes_preserve_ranking(mnet, blob):
    ref = compile_model(mnet, Config()).infer({"data": blob})
    k = next(iter(ref))
    top_ref = np.argsort(ref[k][0])[::-1][:3]

    for quant in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        cal = None
        if quant == QuantMode.INT8_FULL:
            rng = np.random.default_rng(1)
            cal = [{"data": blob},
                   {"data": rng.uniform(0, 255, blob.shape).astype(
                       np.float32)}]
        net = compile_model(mnet, Config(quant=quant),
                            calibration_samples=cal)
        out = net.infer({"data": blob})
        top = np.argsort(out[k][0])[::-1][:3]
        assert top[0] == top_ref[0], (quant, top, top_ref)


def test_sharded_dp_tp(mnet, blob):
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    net = compile_model(mnet, Config())
    ref = net.infer({"data": blob})
    shard_compiled(net, build_mesh(MeshConfig(data=4, model=2)),
                   tensor_parallel=True)
    batch = np.repeat(blob, 4, axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(out[k][b], ref[k][0], rtol=1e-4,
                                   atol=1e-6)
