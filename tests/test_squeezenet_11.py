"""The ninth model family: programmatic SqueezeNet-1.1 (tools/gen_squeezenet.py).

Exercises graph shapes none of the other eight families do: Fire
modules (1x1 squeeze -> parallel 1x1/3x3 expand -> Concat), ceil-mode
MaxPool chains, and a fully-convolutional class head — conv10 1x1 +
global AvgPool with no MatMul anywhere in the graph."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def sqnet():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("squeezenet-1.1")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)


def test_topology(sqnet):
    # 8 fire modules x 3 convs + conv1 + conv10 = 26 convs, 8 fire
    # concats, 3 ceil-mode MaxPools, one global AvgPool, zero MatMuls.
    assert len(sqnet.find_by_type("Convolution")) == 26
    assert len(sqnet.find_by_type("Concat")) == 8
    assert len(sqnet.find_by_type("MaxPool")) == 3
    assert len(sqnet.find_by_type("AvgPool")) == 1
    assert len(sqnet.find_by_type("MatMul")) == 0
    for n in sqnet.find_by_type("MaxPool"):
        assert n.attrs["rounding_type"] == "ceil"


def test_interpreter_vs_xla(sqnet, blob):
    ref = Interpreter(sqnet).run({"data": blob})
    net = compile_model(sqnet, Config(backend=Backend.XLA))
    got = net.infer({"data": blob})
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == (1, 1000)
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)
    assert abs(float(next(iter(got.values())).sum()) - 1.0) < 1e-3


def test_int8_modes_preserve_ranking(sqnet, blob):
    ref = compile_model(sqnet, Config()).infer({"data": blob})
    k = next(iter(ref))
    top_ref = np.argsort(ref[k][0])[::-1][:3]

    for quant in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        cal = None
        if quant == QuantMode.INT8_FULL:
            rng = np.random.default_rng(1)
            cal = [{"data": blob},
                   {"data": rng.uniform(0, 255, blob.shape).astype(
                       np.float32)}]
        net = compile_model(sqnet, Config(quant=quant),
                            calibration_samples=cal)
        out = net.infer({"data": blob})
        top = np.argsort(out[k][0])[::-1][:3]
        assert top[0] == top_ref[0], (quant, top, top_ref)


def test_sharded_dp_tp(sqnet, blob):
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    net = compile_model(sqnet, Config())
    ref = net.infer({"data": blob})
    shard_compiled(net, build_mesh(MeshConfig(data=4, model=2)),
                   tensor_parallel=True)
    batch = np.repeat(blob, 4, axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(out[k][b], ref[k][0], rtol=1e-4,
                                   atol=1e-6)
