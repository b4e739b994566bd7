"""The tenth model family: programmatic U-Net (tools/gen_unet.py) —
the first segmentation task in the suite.

Exercises graph shapes none of the other nine families do: an
encoder-decoder with ConvolutionBackpropData 2x2/s2 up-convolutions,
long skip Concats joining tensors from different scales, and a dense
per-pixel softmax head (axis=1 over a rank-4 tensor).  The reference
engine supports neither the op nor any segmentation driver."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def unet():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("unet")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 3, 128, 128)).astype(np.float32)


def test_topology(unet):
    # 7 double-conv blocks x 2 + the 1x1 class head = 15 convs, 3
    # transposed-conv up-samplings, 3 skip concats, 3 pools, and a
    # channel-axis softmax over the rank-4 logits.
    assert len(unet.find_by_type("Convolution")) == 15
    assert len(unet.find_by_type("ConvolutionBackpropData")) == 3
    assert len(unet.find_by_type("Concat")) == 3
    assert len(unet.find_by_type("MaxPool")) == 3
    sm = unet.find_by_type("SoftMax")
    assert len(sm) == 1 and int(sm[0].attrs["axis"]) == 1


def test_interpreter_vs_xla(unet, blob):
    ref = Interpreter(unet).run({"data": blob})
    net = compile_model(unet, Config(backend=Backend.XLA))
    got = net.infer({"data": blob})
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == (1, 8, 128, 128)
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)
    # softmax over axis=1: every pixel's class distribution sums to 1
    sums = next(iter(got.values())).sum(axis=1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-3)


def test_int8_modes_preserve_mask(unet, blob):
    """Per-pixel argmax is the segmentation analogue of top-1: the
    int8 modes must reproduce the fp32 class mask on (nearly) every
    pixel — boundary pixels between near-tied classes may churn."""
    ref = compile_model(unet, Config()).infer({"data": blob})
    k = next(iter(ref))
    ref_mask = np.argmax(ref[k], axis=1)

    for quant in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        cal = None
        if quant == QuantMode.INT8_FULL:
            rng = np.random.default_rng(1)
            cal = [{"data": blob},
                   {"data": rng.uniform(0, 255, blob.shape).astype(
                       np.float32)}]
        net = compile_model(unet, Config(quant=quant),
                            calibration_samples=cal)
        out = net.infer({"data": blob})
        agree = float(np.mean(np.argmax(out[k], axis=1) == ref_mask))
        assert agree > 0.95, (quant, agree)


def test_sharded_dp_tp(unet, blob):
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    net = compile_model(unet, Config())
    ref = net.infer({"data": blob})
    shard_compiled(net, build_mesh(MeshConfig(data=4, model=2)),
                   tensor_parallel=True)
    batch = np.repeat(blob, 4, axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(out[k][b], ref[k][0], rtol=1e-4,
                                   atol=1e-6)
