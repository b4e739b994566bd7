"""The seventh model family: programmatic ShuffleNetV2 (tools/gen_shufflenet.py).

Exercises graph shapes none of the other six families do: channel Split
(the multi-output op) in 13 basic units, channel shuffle (rank-5
reshape→transpose→reshape), dual-branch stride-2 downsample units, and a
ReduceMean(axes=(2,3)) global-average-pool head — the form Model
Optimizer actually exports."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def snet():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("shufflenet-v2")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)


def test_topology(snet):
    # stages (4, 8, 4): 13 basic units carry one Split each; every unit
    # (16) ends in a channel shuffle; ReduceMean head, no AvgPool at all.
    assert len(snet.find_by_type("Split")) == 13
    assert len(snet.find_by_type("ReduceMean")) == 1
    assert len(snet.find_by_type("AvgPool")) == 0
    assert len(snet.find_by_type("GroupConvolution")) == 13 + 2 * 3


def test_interpreter_vs_xla(snet, blob):
    ref = Interpreter(snet).run({"data": blob})
    net = compile_model(snet, Config(backend=Backend.XLA))
    got = net.infer({"data": blob})
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == (1, 1000)
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)
    assert abs(float(next(iter(got.values())).sum()) - 1.0) < 1e-3


def test_int8_modes_preserve_ranking(snet, blob):
    ref = compile_model(snet, Config()).infer({"data": blob})
    k = next(iter(ref))
    top_ref = np.argsort(ref[k][0])[::-1][:3]

    for quant in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        cal = None
        if quant == QuantMode.INT8_FULL:
            rng = np.random.default_rng(1)
            cal = [{"data": blob},
                   {"data": rng.uniform(0, 255, blob.shape).astype(
                       np.float32)}]
        net = compile_model(snet, Config(quant=quant),
                            calibration_samples=cal)
        out = net.infer({"data": blob})
        top = np.argsort(out[k][0])[::-1][:3]
        assert top[0] == top_ref[0], (quant, top, top_ref)


def test_sharded_dp_tp(snet, blob):
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    net = compile_model(snet, Config())
    ref = net.infer({"data": blob})
    shard_compiled(net, build_mesh(MeshConfig(data=4, model=2)),
                   tensor_parallel=True)
    batch = np.repeat(blob, 4, axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(out[k][b], ref[k][0], rtol=1e-4,
                                   atol=1e-6)
