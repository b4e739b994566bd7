"""PrePostProcessor (preprocess.py) — preprocessing baked into the graph.

The reference hand-rolls cv2 preprocessing on the host
(test_googlenet_v1.py:20-27); here the declared steps become graph ops and
must match the hand-rolled numpy pipeline on every backend, survive the
writer→parser round-trip, and compose with quantization."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.preprocess import PrePostProcessor
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


def _tiny_cnn(in_shape=(1, 3, 8, 8)):
    rng = np.random.default_rng(0)
    b = GraphBuilder("tiny")
    x = b.parameter("data", in_shape)
    w = rng.normal(0, 0.2, (4, in_shape[1], 3, 3)).astype(np.float32)
    y = b.relu(b.conv2d(x, b.const(w), pads=((1, 1), (1, 1))))
    b.result(y, name="out")
    return b.build()


def _run_both(model, feed, rtol=1e-4, atol=1e-4):
    ref = Interpreter(model).run(feed)
    got = compile_model(model, Config(backend=Backend.XLA)).infer(feed)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=rtol, atol=atol)
    return ref


def test_full_pipeline_matches_hand_rolled_numpy():
    """u8 NHWC BGR 12x12 input → f32, RGB, bilinear-resize to 8x8, NCHW,
    mean/scale — vs the same steps written by hand in numpy."""
    model = _tiny_cnn()
    base = Interpreter(model)

    ppp = PrePostProcessor(model)
    ppp.input().tensor().set_element_type("u8").set_layout("NHWC") \
        .set_spatial_static_shape(12, 12).set_color_format("BGR")
    ppp.input().preprocess().convert_element_type("f32") \
        .convert_color("RGB").resize("linear").convert_layout() \
        .mean([110.0, 115.0, 120.0]).scale([58.0, 57.0, 56.0])
    m2 = ppp.build()

    # the new tensor-side contract
    p = m2.parameters[0]
    assert p.outputs[p.out_port].shape == (1, 12, 12, 3)
    assert p.outputs[p.out_port].dtype == np.uint8

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (1, 12, 12, 3), dtype=np.uint8)

    # hand-rolled twin of the declared steps (align_corners linear resize)
    x = raw.astype(np.float32)[..., ::-1]                      # BGR→RGB
    li = np.linspace(0, 11, 8)
    lo, hi = np.floor(li).astype(int), np.ceil(li).astype(int)
    w = (li - lo).astype(np.float32)
    x = (x[:, lo] * (1 - w)[None, :, None, None]
         + x[:, hi] * w[None, :, None, None])                  # rows
    x = (x[:, :, lo] * (1 - w)[None, None, :, None]
         + x[:, :, hi] * w[None, None, :, None])               # cols
    x = x.transpose(0, 3, 1, 2)                                # NHWC→NCHW
    x = (x - np.array([110., 115., 120.], np.float32).reshape(1, 3, 1, 1)) \
        / np.array([58., 57., 56.], np.float32).reshape(1, 3, 1, 1)
    want = base.run({"data": x.astype(np.float32)})

    got = _run_both(m2, {"data": raw})
    np.testing.assert_allclose(got["out"], want["out"], rtol=1e-4, atol=1e-4)


def test_mean_scale_in_tensor_layout_before_conversion():
    """mean/scale declared BEFORE convert_layout apply along the NHWC
    channel axis — per-channel constants must follow the current layout."""
    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.input().tensor().set_layout("NHWC")
    ppp.input().preprocess().mean([1.0, 2.0, 3.0]).convert_layout()
    m2 = ppp.build()

    raw = np.ones((1, 8, 8, 3), np.float32)
    out = Interpreter(m2).run({"data": raw})
    want = Interpreter(model).run({
        "data": (raw - np.array([1., 2., 3.], np.float32)).transpose(
            0, 3, 1, 2)})
    np.testing.assert_allclose(out["out"], want["out"], rtol=1e-5)


def test_implicit_completion_layout_and_dtype():
    """No explicit steps at all: a u8 NHWC tensor still reaches the f32
    NCHW model via implicit Transpose + Convert (OpenVINO inserts the
    same)."""
    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.input().tensor().set_element_type("u8").set_layout("NHWC")
    m2 = ppp.build()

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 4, (1, 8, 8, 3), dtype=np.uint8)
    got = _run_both(m2, {"data": raw})
    want = Interpreter(model).run(
        {"data": raw.transpose(0, 3, 1, 2).astype(np.float32)})
    np.testing.assert_allclose(got["out"], want["out"], rtol=1e-5)


def test_spatial_mismatch_without_resize_raises():
    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.input().tensor().set_spatial_static_shape(16, 16)
    with pytest.raises(ValueError, match="resize"):
        ppp.build()


def test_convert_color_requires_tensor_format():
    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.input().preprocess().convert_color("RGB")
    with pytest.raises(ValueError, match="set_color_format"):
        ppp.build()


def test_output_postprocess_convert():
    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.output().postprocess().convert_element_type("f16")
    m2 = ppp.build()
    out = Interpreter(m2).run({"data": np.ones((1, 3, 8, 8), np.float32)})
    assert out["out"].dtype == np.float16
    got = compile_model(m2, Config(backend=Backend.XLA)).infer(
        {"data": np.ones((1, 3, 8, 8), np.float32)})
    assert np.asarray(got["out"]).dtype == np.float16


def test_writer_roundtrip_and_ienet_facade(tmp_path):
    """PPP output serializes like any graph; the IENetwork facade variant
    rebinds in place and still loads through the public API."""
    from pyopenvino_tpu.api import IECore
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model

    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.input().tensor().set_element_type("u8").set_layout("NHWC")
    ppp.input().preprocess().mean([12.0]).scale([3.0])
    m2 = ppp.build()

    xml = str(tmp_path / "ppp.xml")
    write_ir_model(m2, xml)
    m3 = read_ir_model(xml, xml[:-4] + ".bin")

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (1, 8, 8, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        Interpreter(m3).run({"data": raw})["out"],
        Interpreter(m2).run({"data": raw})["out"], rtol=1e-5)

    # facade round: PrePostProcessor(IENetwork) rebuilds the wrapper
    ie = IECore()
    net = ie.read_network(xml)
    ppp2 = PrePostProcessor(net)
    ppp2.input().preprocess().scale([2.0])
    net2 = ppp2.build()
    assert net2 is net  # rebound in place, like IENetwork.reshape
    exe = ie.load_network(net2, "CPU")
    out = exe.infer({"data": raw})
    assert out["out"].shape == (1, 4, 8, 8)


def test_ppp_composes_with_int8_quantization():
    """Quantized compile (INT8 weight-only) over a PPP graph — the
    inserted chain must not break the fusion/quant passes."""
    from pyopenvino_tpu.config import QuantMode

    model = _tiny_cnn()
    ppp = PrePostProcessor(model)
    ppp.input().tensor().set_element_type("u8")
    ppp.input().preprocess().scale([255.0])
    m2 = ppp.build()

    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, (1, 3, 8, 8), dtype=np.uint8)
    fp = compile_model(m2, Config(backend=Backend.XLA)).infer({"data": raw})
    q = compile_model(
        m2, Config(backend=Backend.XLA, quant=QuantMode.INT8_WEIGHT)
    ).infer({"data": raw})
    np.testing.assert_allclose(q["out"], fp["out"], rtol=0.05, atol=0.02)
