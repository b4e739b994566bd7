"""Native host-runtime library tests (pyopenvino_tpu/native).

The module must behave identically with and without the compiled .so
(numpy fallback), so every test checks native-vs-fallback agreement; fp16
decode is verified bit-exact over the entire 16-bit pattern space.
"""

import numpy as np
import pytest

from pyopenvino_tpu import native


def test_native_builds_and_loads():
    # the toolchain is part of the environment; if this fails the numpy
    # fallback still keeps the framework working, but we want to know
    assert native.available(), "libtpuov_native.so failed to build/load"


def test_fp16_decode_all_bit_patterns():
    allh = np.arange(65536, dtype=np.uint16).view(np.float16)
    got = native.fp16_to_fp32(allh)
    ref = allh.astype(np.float32)
    ok = (got.view(np.uint32) == ref.view(np.uint32)) | (
        np.isnan(got) & np.isnan(ref)
    )
    assert bool(ok.all())


def test_preprocess_matches_numpy_reference():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 123, 77, 3), np.uint8)
    scale = np.array([1 / 255.0, 0.5, 2.0], np.float32)
    bias = np.array([-0.5, 0.0, 1.0], np.float32)
    nat = native.preprocess_batch(imgs, (64, 96), scale=scale, bias=bias)
    ref = native._preprocess_numpy(imgs, (64, 96), scale, bias)
    assert nat.shape == (4, 3, 64, 96)
    np.testing.assert_allclose(nat, ref, atol=1e-4)


def test_preprocess_identity_resize():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 28, 28, 1), np.uint8)
    out = native.preprocess_batch(imgs, (28, 28))
    np.testing.assert_allclose(
        out, imgs.astype(np.float32).transpose(0, 3, 1, 2), atol=1e-5
    )


def test_stack_exact():
    rng = np.random.default_rng(2)
    blobs = [rng.standard_normal((3, 8, 8)).astype(np.float32) for _ in range(7)]
    np.testing.assert_array_equal(native.stack_f32(blobs), np.stack(blobs))


def test_fp16_const_roundtrip_through_parser():
    """An IR with an fp16 Const decodes to the exact fp32 values."""
    from pyopenvino_tpu.ir.xml_parser import parse_ir

    vals = np.array([1.5, -2.25, 6e-8, 65504.0], np.float16)
    xml = """<net name="t" version="10">
      <layers>
        <layer id="0" type="Const" version="opset1">
          <data element_type="f16" shape="4" offset="0" size="8"/>
          <output><port id="0" precision="FP16"><dim>4</dim></port></output>
        </layer>
        <layer id="1" type="Result" version="opset1">
          <input><port id="0" precision="FP16"><dim>4</dim></port></input>
        </layer>
      </layers>
      <edges><edge from-layer="0" from-port="0" to-layer="1" to-port="0"/></edges>
    </net>"""
    model = parse_ir(xml, vals.tobytes())
    const = model.nodes[0].const
    assert const.dtype == np.float32
    np.testing.assert_array_equal(const, vals.astype(np.float32))
