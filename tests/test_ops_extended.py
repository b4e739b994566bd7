"""Extension ops beyond the reference's 21 (ops/extended.py).

Real MO-converted IRs carry unfolded preprocessing (Subtract/Divide/
Power/Sqrt), Squeeze, Gather and Pad; the reference dies on them at run
time (inference_engine.py:270-272).  Each op here is checked
interpreter↔XLA on builder graphs, plus an IR writer→parser round-trip
so the serialized form is loadable too."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


def _parity(model, feed, rtol=1e-5, atol=1e-6):
    ref = Interpreter(model).run(feed)
    got = compile_model(model, Config(backend=Backend.XLA)).infer(feed)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=rtol, atol=atol)
    return ref


@pytest.mark.parametrize("op", ["subtract", "divide", "maximum",
                                "minimum", "power"])
def test_binary_ops_parity(op):
    rng = np.random.default_rng(0)
    b = GraphBuilder(op)
    x = b.parameter("in", (1, 4, 6, 6))
    # per-channel const operand — exercises the CL broadcast path
    c = rng.uniform(0.5, 2.0, (1, 4, 1, 1)).astype(np.float32)
    b.result(getattr(b, op)(x, b.const(c)), name="out")
    m = b.build()
    feed = {"in": rng.uniform(0.1, 2.0, (1, 4, 6, 6)).astype(np.float32)}
    _parity(m, feed)


@pytest.mark.parametrize("op,fn", [("sqrt", np.sqrt), ("exp", np.exp),
                                   ("tanh", np.tanh)])
def test_unary_ops_parity_and_semantics(op, fn):
    rng = np.random.default_rng(1)
    b = GraphBuilder(op)
    x = b.parameter("in", (1, 3, 5, 5))
    b.result(getattr(b, op)(x), name="out")
    m = b.build()
    blob = rng.uniform(0.1, 3.0, (1, 3, 5, 5)).astype(np.float32)
    ref = _parity(m, {"in": blob})
    np.testing.assert_allclose(next(iter(ref.values())), fn(blob),
                               rtol=1e-5, atol=1e-6)


def test_squeeze_with_and_without_axes():
    b = GraphBuilder("sq")
    x = b.parameter("in", (1, 4, 1, 6))
    b.result(b.squeeze(x, axes=(2,)), name="ax")
    b.result(b.squeeze(x), name="all")
    m = b.build()
    blob = np.arange(24, dtype=np.float32).reshape(1, 4, 1, 6)
    ref = _parity(m, {"in": blob})
    assert ref["ax"].shape == (1, 4, 6)
    assert ref["all"].shape == (4, 6)


def test_squeeze_non_unit_axis_rejected():
    b = GraphBuilder("sq_bad")
    x = b.parameter("in", (1, 4, 1, 6))
    with pytest.raises(ValueError, match="extent"):
        b.squeeze(x, axes=(1,))


def test_gather_axes():
    rng = np.random.default_rng(2)
    b = GraphBuilder("gather")
    x = b.parameter("in", (1, 6, 4, 4))
    b.result(b.gather(x, [4, 0, 2], axis=1), name="out")
    m = b.build()
    blob = rng.normal(0, 1, (1, 6, 4, 4)).astype(np.float32)
    ref = _parity(m, {"in": blob})
    np.testing.assert_allclose(ref["out"], blob[:, [4, 0, 2]], rtol=1e-6)


@pytest.mark.parametrize("mode", ["constant", "edge", "reflect",
                                  "symmetric"])
def test_pad_modes(mode):
    rng = np.random.default_rng(3)
    b = GraphBuilder("pad")
    x = b.parameter("in", (1, 3, 5, 5))
    value = 2.5 if mode == "constant" else None
    b.result(b.pad(x, (0, 0, 1, 2), (0, 0, 2, 1), mode=mode, value=value),
             name="out")
    m = b.build()
    blob = rng.normal(0, 1, (1, 3, 5, 5)).astype(np.float32)
    ref = _parity(m, {"in": blob})
    assert ref["out"].shape == (1, 3, 8, 8)
    kw = {"constant_values": 2.5} if mode == "constant" else {}
    want = np.pad(blob, ((0, 0), (0, 0), (1, 2), (2, 1)), mode=mode, **kw)
    np.testing.assert_allclose(ref["out"], want, rtol=1e-6)


def test_preprocessing_chain_end_to_end_and_int8():
    """The canonical unfolded MO preprocessing: (x - mean) / std → conv →
    relu — parity across backends and runnable under INT8 weight-only."""
    rng = np.random.default_rng(4)
    b = GraphBuilder("prep")
    x = b.parameter("in", (1, 3, 12, 12))
    mean = rng.uniform(100, 150, (1, 3, 1, 1)).astype(np.float32)
    std = rng.uniform(50, 80, (1, 3, 1, 1)).astype(np.float32)
    y = b.divide(b.subtract(x, b.const(mean)), b.const(std))
    w = rng.normal(0, 0.3, (8, 3, 3, 3)).astype(np.float32)
    y = b.relu(b.conv2d(y, b.const(w), pads=((1, 1), (1, 1))))
    b.result(y, name="out")
    m = b.build()
    blob = rng.uniform(0, 255, (1, 3, 12, 12)).astype(np.float32)
    ref = _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)

    q = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
    got = q.infer({"in": blob})
    k = next(iter(ref))
    np.testing.assert_allclose(got[k], ref[k], rtol=0.2, atol=0.05)


def test_extended_ops_survive_writer_parser_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model

    b = GraphBuilder("roundtrip")
    x = b.parameter("in", (1, 3, 6, 6))
    y = b.subtract(x, b.const(
        rng.normal(0, 1, (1, 3, 1, 1)).astype(np.float32)))
    y = b.sqrt(b.maximum(y, b.const(np.float32(0.1).reshape(1, 1, 1, 1))))
    y = b.pad(y, (0, 0, 1, 1), (0, 0, 1, 1), mode="edge")
    y = b.gather(y, [1, 2], axis=1)
    b.result(b.squeeze(y, axes=(0,)), name="out")
    m = b.build()

    xml = tmp_path / "ext.xml"
    write_ir_model(m, str(xml))
    m2 = read_ir_model(str(xml))
    blob = rng.uniform(0.2, 2.0, (1, 3, 6, 6)).astype(np.float32)
    a = Interpreter(m).run({"in": blob})
    c = compile_model(m2, Config()).infer({"in": blob})
    np.testing.assert_allclose(c["out"], a["out"], rtol=1e-5, atol=1e-6)
    assert c["out"].shape == (2, 8, 8)

class TestInterpolate:
    def _run(self, in_hw, sizes, mode, align=False, blob=None):
        b = GraphBuilder("interp")
        x = b.parameter("in", (1, 2) + in_hw)
        b.result(b.interpolate(x, sizes, mode=mode, align_corners=align),
                 name="out")
        m = b.build()
        if blob is None:
            blob = np.random.default_rng(0).normal(
                0, 1, (1, 2) + in_hw).astype(np.float32)
        ref = _parity(m, {"in": blob})
        return ref["out"], blob

    def test_nearest_2x_upsample_repeats(self):
        out, blob = self._run((4, 4), (8, 8), "nearest")
        np.testing.assert_array_equal(out, blob.repeat(2, 2).repeat(2, 3))

    def test_linear_known_values(self):
        # half-pixel linear 2→4 of [0, 1] → [0, 0.25, 0.75, 1]
        blob = np.array([0.0, 1.0], np.float32).reshape(1, 1, 1, 2)
        b = GraphBuilder("lin")
        x = b.parameter("in", (1, 1, 1, 2))
        b.result(b.interpolate(x, (1, 4), mode="linear"), name="out")
        ref = _parity(b.build(), {"in": blob})
        np.testing.assert_allclose(
            ref["out"].reshape(-1), [0, 0.25, 0.75, 1], rtol=1e-6)

    def test_linear_align_corners(self):
        blob = np.array([0.0, 1.0], np.float32).reshape(1, 1, 1, 2)
        b = GraphBuilder("linac")
        x = b.parameter("in", (1, 1, 1, 2))
        b.result(b.interpolate(x, (1, 4), mode="linear",
                               align_corners=True), name="out")
        ref = _parity(b.build(), {"in": blob})
        np.testing.assert_allclose(
            ref["out"].reshape(-1), [0, 1 / 3, 2 / 3, 1], rtol=1e-5)

    def test_downsample_parity(self):
        out, _ = self._run((9, 9), (4, 5), "linear")
        assert out.shape == (1, 2, 4, 5)

    def test_nearest_downsample_parity(self):
        out, _ = self._run((7, 7), (3, 3), "nearest")
        assert out.shape == (1, 2, 3, 3)


def test_unet_style_segmentation_topology():
    """Encoder–decoder with Interpolate 2× upsampling and skip concats —
    the segmentation/FPN shape none of the six classifier/detector
    families exercise; ties Interpolate + Concat + the preprocessing ops
    together in one compiled graph (fp32 parity + int8w runnable)."""
    rng = np.random.default_rng(6)
    b = GraphBuilder("unet")

    def conv(x, co, k=3):
        w = rng.normal(0, np.sqrt(2.0 / (x.shape[1] * k * k)),
                       (co, x.shape[1], k, k)).astype(np.float32)
        return b.relu(b.conv2d(x, b.const(w), pads=((k // 2,) * 2,) * 2))

    x = b.parameter("in", (1, 3, 16, 16))
    x = b.divide(b.subtract(x, b.const(
        np.full((1, 3, 1, 1), 127.5, np.float32))),
        b.const(np.full((1, 3, 1, 1), 127.5, np.float32)))
    e1 = conv(x, 8)                                    # 16×16
    e2 = conv(b.max_pool(e1, (2, 2), (2, 2)), 16)      # 8×8
    bott = conv(b.max_pool(e2, (2, 2), (2, 2)), 32)    # 4×4
    d2 = conv(b.concat([b.interpolate(bott, (8, 8), mode="linear"), e2]),
              16)                                      # 8×8
    d1 = conv(b.concat([b.interpolate(d2, (16, 16), mode="nearest"), e1]),
              8)                                       # 16×16
    logits = conv(d1, 2, k=1)
    b.result(b.sigmoid(logits), name="mask")
    m = b.build()

    blob = rng.uniform(0, 255, (1, 3, 16, 16)).astype(np.float32)
    ref = _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)
    assert ref["mask"].shape == (1, 2, 16, 16)

    q = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
    got = q.infer({"in": blob})
    assert np.all(np.isfinite(got["mask"]))


@pytest.mark.parametrize("kind,fn", [("mean", np.mean), ("max", np.max),
                                     ("sum", np.sum)])
@pytest.mark.parametrize("keep", [True, False])
def test_reduce_ops(kind, fn, keep):
    rng = np.random.default_rng(8)
    b = GraphBuilder(f"red_{kind}")
    x = b.parameter("in", (2, 4, 5, 5))
    b.result(b.reduce(kind, x, (2, 3), keep_dims=keep), name="out")
    m = b.build()
    blob = rng.normal(0, 1, (2, 4, 5, 5)).astype(np.float32)
    ref = _parity(m, {"in": blob})
    want = fn(blob, axis=(2, 3), keepdims=keep)
    np.testing.assert_allclose(ref["out"], want, rtol=1e-5, atol=1e-6)
    assert ref["out"].shape == ((2, 4, 1, 1) if keep else (2, 4))


def test_reduce_mean_as_global_pool_head():
    """MO exports global average pooling as ReduceMean(axes=(2,3)) —
    a classifier head built that way must compile and match."""
    rng = np.random.default_rng(9)
    b = GraphBuilder("gap")
    x = b.parameter("in", (1, 3, 8, 8))
    w = rng.normal(0, 0.3, (16, 3, 3, 3)).astype(np.float32)
    y = b.relu(b.conv2d(x, b.const(w), pads=((1, 1), (1, 1))))
    y = b.reduce("mean", y, (2, 3), keep_dims=False)   # (1, 16)
    wf = rng.normal(0, 0.3, (16, 10)).astype(np.float32)
    b.result(b.softmax(b.matmul(y, b.const(wf)), axis=1), name="prob")
    m = b.build()
    blob = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    ref = _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)
    assert abs(float(ref["prob"].sum()) - 1.0) < 1e-4


def test_interpolate_opset1_defaults_and_pads():
    """Attr-omitted align_corners must follow the opset1 default (1 —
    corner-aligned), pads_begin/pads_end zero-pad before resampling, and
    antialias fails fast."""
    blob = np.array([0.0, 1.0], np.float32).reshape(1, 1, 1, 2)

    def build(mutate):
        b = GraphBuilder("d")
        x = b.parameter("in", (1, 1, 1, 2))
        p = b.interpolate(x, (1, 4), mode="linear")
        mutate(b._nodes[p.nid].attrs)
        b.result(p, name="out")
        return b.build()

    # omitted attr → align_corners=1 → [0, 1/3, 2/3, 1]
    m = build(lambda a: a.pop("align_corners"))
    ref = _parity(m, {"in": blob})
    np.testing.assert_allclose(
        ref["out"].reshape(-1), [0, 1 / 3, 2 / 3, 1], rtol=1e-5)

    # pads_end pads a zero column before resampling: last output == 0
    m = build(lambda a: a.update(pads_end="0,0,0,1"))
    # padded input is [0, 1, 0] (W=3); declared out shape unchanged (1,4)
    ref = _parity(m, {"in": blob})
    out = ref["out"].reshape(-1)
    assert out.shape == (4,)
    assert out[0] == 0.0 and out[-1] == 0.0 and out.max() > 0.5

    # antialias fails fast at execution (the mutation lands after the
    # builder's eager shape inference)
    m = build(lambda a: a.update(antialias="1"))
    with pytest.raises(ValueError, match="antialias"):
        Interpreter(m).run({"in": blob})


class TestSplit:
    def test_split_parity_and_identity(self):
        rng = np.random.default_rng(10)
        b = GraphBuilder("split")
        x = b.parameter("in", (1, 8, 4, 4))
        lo, hi = b.split(x, axis=1, num_splits=2)
        b.result(lo, name="lo")
        b.result(hi, name="hi")
        b.result(b.concat([lo, hi], axis=1), name="roundtrip")
        m = b.build()
        blob = rng.normal(0, 1, (1, 8, 4, 4)).astype(np.float32)
        ref = _parity(m, {"in": blob})
        np.testing.assert_array_equal(ref["lo"], blob[:, :4])
        np.testing.assert_array_equal(ref["hi"], blob[:, 4:])
        np.testing.assert_array_equal(ref["roundtrip"], blob)

    def test_split_indivisible_rejected(self):
        b = GraphBuilder("bad")
        x = b.parameter("in", (1, 6, 4, 4))
        with pytest.raises(ValueError, match="divisible"):
            b.split(x, axis=1, num_splits=4)

    def test_split_writer_round_trip(self, tmp_path):
        from pyopenvino_tpu.ir import read_ir_model
        from pyopenvino_tpu.ir.writer import write_ir_model

        rng = np.random.default_rng(11)
        b = GraphBuilder("sw")
        x = b.parameter("in", (1, 4, 4, 4))
        a, c = b.split(x, axis=1, num_splits=2)
        b.result(b.add(a, c), name="sum")
        m = b.build()
        xml = tmp_path / "split.xml"
        write_ir_model(m, str(xml))
        m2 = read_ir_model(str(xml))
        blob = rng.normal(0, 1, (1, 4, 4, 4)).astype(np.float32)
        want = Interpreter(m).run({"in": blob})["sum"]
        got = compile_model(m2, Config()).infer({"in": blob})["sum"]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_shufflenet_v2_unit(self):
        """A ShuffleNetV2 basic unit: channel split → (identity ‖ 1×1 →
        3×3 depthwise → 1×1) → concat → channel shuffle
        (reshape/transpose) — Split + depthwise + the shuffle pattern in
        one compiled graph, fp32 parity + int8w runnable."""
        rng = np.random.default_rng(12)
        C, HW = 16, 8
        b = GraphBuilder("shuffle_unit")
        x = b.parameter("in", (1, C, HW, HW))
        keep, branch = b.split(x, axis=1, num_splits=2)
        half = C // 2

        def conv1x1(t, co):
            w = rng.normal(0, np.sqrt(2.0 / t.shape[1]),
                           (co, t.shape[1], 1, 1)).astype(np.float32)
            return b.relu(b.conv2d(t, b.const(w)))

        y = conv1x1(branch, half)
        wd = rng.normal(0, 0.4, (half, 1, 1, 3, 3)).astype(np.float32)
        y = b.group_conv2d(y, b.const(wd), pads=((1, 1), (1, 1)))
        y = conv1x1(y, half)
        cat = b.concat([keep, y], axis=1)                # (1, C, H, W)
        # channel shuffle g=2: (1,2,C/2,H,W) → transpose → flatten back
        s = b.reshape(cat, (1, 2, half, HW, HW))
        s = b.transpose(s, (0, 2, 1, 3, 4))
        s = b.reshape(s, (1, C, HW, HW))
        b.result(s, name="out")
        m = b.build()

        blob = rng.normal(0, 1, (1, C, HW, HW)).astype(np.float32)
        ref = _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)
        assert ref["out"].shape == (1, C, HW, HW)
        # the kept half must appear, shuffled, among the output channels
        np.testing.assert_array_equal(ref["out"][:, 0], blob[:, 0])

        q = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
        got = q.infer({"in": blob})
        assert np.all(np.isfinite(got["out"]))


class TestActivations:
    """The activation extension set (Elu/Gelu/SoftPlus/Swish/HSwish/
    HSigmoid/Mish/PReLU) — parity + closed-form semantic checks."""

    def _run(self, build_fn, blob):
        b = GraphBuilder("act")
        x = b.parameter("in", blob.shape)
        b.result(build_fn(b, x), name="out")
        return _parity(b.build(), {"in": blob}, rtol=1e-5,
                       atol=1e-6)["out"]

    @pytest.fixture(scope="class")
    def blob(self):
        # spans negative/positive and large-|x| (overflow-stability check)
        return np.linspace(-30, 30, 4 * 5 * 5).reshape(
            1, 4, 5, 5).astype(np.float32)

    def test_elu(self, blob):
        out = self._run(lambda b, x: b.elu(x, alpha=0.5), blob)
        want = np.where(blob > 0, blob, 0.5 * np.expm1(blob))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_gelu_erf_and_tanh(self, blob):
        from scipy.special import erf

        out = self._run(lambda b, x: b.gelu(x), blob)
        want = 0.5 * blob * (1 + erf(blob / np.sqrt(2)))
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        out_t = self._run(lambda b, x: b.gelu(x, mode="tanh"), blob)
        np.testing.assert_allclose(out_t, want, rtol=1e-2, atol=2e-2)

    def test_softplus_stable(self, blob):
        out = self._run(lambda b, x: b.softplus(x), blob)
        want = np.logaddexp(0, blob)
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
        assert np.all(np.isfinite(out))

    def test_swish_beta(self, blob):
        out = self._run(lambda b, x: b.swish(x, beta=0.75), blob)
        want = blob / (1 + np.exp(np.clip(-0.75 * blob, -60, 60)))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

    def test_hswish_hsigmoid(self, blob):
        hsig = np.clip(blob + 3, 0, 6) / 6
        out = self._run(lambda b, x: b.hsigmoid(x), blob)
        np.testing.assert_allclose(out, hsig, rtol=1e-6)
        out = self._run(lambda b, x: b.hswish(x), blob)
        np.testing.assert_allclose(out, blob * hsig, rtol=1e-5, atol=1e-5)

    def test_mish(self, blob):
        out = self._run(lambda b, x: b.mish(x), blob)
        want = blob * np.tanh(np.logaddexp(0, blob))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

    def test_prelu_per_channel(self, blob):
        slope = np.array([0.0, 0.1, 0.25, 1.0], np.float32).reshape(
            1, 4, 1, 1)
        out = self._run(lambda b, x: b.prelu(x, slope), blob)
        want = np.where(blob > 0, blob, slope * blob)
        np.testing.assert_allclose(out, want, rtol=1e-6)


class TestMVN:
    @pytest.mark.parametrize("across", [False, True])
    @pytest.mark.parametrize("normalize", [False, True])
    def test_mvn_semantics(self, across, normalize):
        rng = np.random.default_rng(13)
        blob = (rng.normal(3, 5, (2, 4, 6, 6))).astype(np.float32)
        b = GraphBuilder("mvn")
        x = b.parameter("in", blob.shape)
        b.result(b.mvn(x, across_channels=across,
                       normalize_variance=normalize, eps=1e-6),
                 name="out")
        out = _parity(b.build(), {"in": blob}, rtol=1e-4,
                      atol=1e-5)["out"]
        axes = (1, 2, 3) if across else (2, 3)
        centered = blob - blob.mean(axis=axes, keepdims=True)
        want = centered
        if normalize:
            want = centered / np.sqrt(
                (centered ** 2).mean(axis=axes, keepdims=True) + 1e-6)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        # normalized output has ~zero mean (and ~unit variance) per span
        np.testing.assert_allclose(
            out.mean(axis=axes), 0.0, atol=1e-4)


def test_squeeze_excitation_block():
    """A full Squeeze-and-Excitation block — ReduceMean(keep_dims) →
    1×1 conv → Swish → 1×1 conv → Sigmoid → channel-wise Multiply —
    composed entirely from the extension + reference op sets (the
    EfficientNet building block).  fp32 parity + int8w runnable."""
    rng = np.random.default_rng(14)
    C, r = 16, 4
    b = GraphBuilder("se")
    x = b.parameter("in", (1, C, 8, 8))
    s = b.reduce("mean", x, (2, 3), keep_dims=True)        # (1, C, 1, 1)
    w1 = rng.normal(0, np.sqrt(2.0 / C), (C // r, C, 1, 1)).astype(
        np.float32)
    s = b.swish(b.conv2d(s, b.const(w1)))
    w2 = rng.normal(0, np.sqrt(2.0 / (C // r)), (C, C // r, 1, 1)).astype(
        np.float32)
    gate = b.sigmoid(b.conv2d(s, b.const(w2)))             # (1, C, 1, 1)
    b.result(b.multiply(x, gate), name="out")
    m = b.build()

    blob = rng.normal(0, 1, (1, C, 8, 8)).astype(np.float32)
    ref = _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)
    assert ref["out"].shape == (1, C, 8, 8)
    # gate is in (0,1): |out| <= |x| elementwise
    assert np.all(np.abs(ref["out"]) <= np.abs(blob) + 1e-6)

    q = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
    got = q.infer({"in": blob})
    np.testing.assert_allclose(got["out"], ref["out"], rtol=0.25,
                               atol=0.05)


class TestConvTranspose:
    """ConvolutionBackpropData — the transposed-conv decoder op."""

    @pytest.mark.parametrize("stride,dil,pad,opad", [
        (1, 1, 0, 0), (2, 1, 0, 0), (2, 1, 1, 1), (3, 2, 1, 2), (2, 2, 0, 1),
    ])
    def test_parity_and_torch_truth(self, stride, dil, pad, opad):
        rng = np.random.default_rng(9)
        b = GraphBuilder("deconv")
        x = b.parameter("in", (2, 3, 7, 6))
        w = rng.normal(0, 0.5, (3, 5, 3, 3)).astype(np.float32)
        b.result(b.conv_transpose2d(
            x, b.const(w), strides=(stride, stride),
            pads=((pad, pad), (pad, pad)), dilations=(dil, dil),
            output_padding=(opad, opad)), name="out")
        m = b.build()
        blob = rng.normal(0, 1, (2, 3, 7, 6)).astype(np.float32)
        ref = _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)

        import torch
        truth = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(blob), torch.from_numpy(w), stride=stride,
            padding=pad, output_padding=opad, dilation=dil).numpy()
        np.testing.assert_allclose(ref["out"], truth, rtol=1e-4, atol=1e-4)

    def test_weight_ci_mismatch_rejected(self):
        b = GraphBuilder("deconv_bad")
        x = b.parameter("in", (1, 4, 5, 5))
        w = np.zeros((3, 5, 2, 2), np.float32)  # Ci 3 != input C 4
        # GraphBuilder shape inference is eager — the mismatch fails at
        # graph-construction time, before any compile.
        with pytest.raises(ValueError, match="weight Ci"):
            b.conv_transpose2d(x, b.const(w))

    def test_output_shape_input_validated(self):
        # Consistent constant output_shape input (port 2) is accepted;
        # an inconsistent one fails fast (auto_pad solving unsupported).
        rng = np.random.default_rng(3)
        w = rng.normal(0, 0.5, (2, 4, 3, 3)).astype(np.float32)
        blob = rng.normal(0, 1, (1, 2, 5, 5)).astype(np.float32)

        def build(target):
            b = GraphBuilder("deconv_os")
            x = b.parameter("in", (1, 2, 5, 5))
            port = b._add_node("ConvolutionBackpropData", [
                x, b.const(w), b.const(np.asarray(target, np.int64))], {
                "strides": "2,2", "pads_begin": "1,1", "pads_end": "1,1",
                "output_padding": "1,1", "auto_pad": "explicit",
            }, None)
            b.result(port, name="out")
            return b.build()

        ok = build((10, 10))  # (5-1)*2 - 2 + 2 + 1 + 1 = 10
        ref = _parity(ok, {"in": blob}, rtol=1e-4, atol=1e-5)
        assert ref["out"].shape == (1, 4, 10, 10)
        with pytest.raises(ValueError, match="output_shape"):
            compile_model(build((12, 12)), Config())

    def test_unet_with_real_deconv_decoder(self, tmp_path):
        """U-Net whose decoder upsamples via ConvolutionBackpropData
        (the MO-exported form) instead of Interpolate; survives the
        writer→parser round trip and runs under int8w."""
        from pyopenvino_tpu.ir import read_ir_model
        from pyopenvino_tpu.ir.writer import write_ir_model

        rng = np.random.default_rng(11)
        b = GraphBuilder("unet_deconv")

        def conv(x, co, k=3):
            w = rng.normal(0, np.sqrt(2.0 / (x.shape[1] * k * k)),
                           (co, x.shape[1], k, k)).astype(np.float32)
            return b.relu(b.conv2d(x, b.const(w), pads=((k // 2,) * 2,) * 2))

        def up(x, co):
            # 2x2/s2 deconv: the classic U-Net "up-convolution"
            w = rng.normal(0, np.sqrt(1.0 / x.shape[1]),
                           (x.shape[1], co, 2, 2)).astype(np.float32)
            return b.conv_transpose2d(x, b.const(w), strides=(2, 2))

        x = b.parameter("in", (1, 3, 16, 16))
        e1 = conv(x, 8)                                    # 16²
        e2 = conv(b.max_pool(e1, (2, 2), (2, 2)), 16)      # 8²
        bott = conv(b.max_pool(e2, (2, 2), (2, 2)), 32)    # 4²
        d2 = conv(b.concat([up(bott, 16), e2]), 16)        # 8²
        d1 = conv(b.concat([up(d2, 8), e1]), 8)            # 16²
        b.result(b.sigmoid(conv(d1, 2, k=1)), name="mask")
        m = b.build()

        xml = tmp_path / "unet_deconv.xml"
        write_ir_model(m, str(xml))
        m2 = read_ir_model(str(xml))

        blob = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
        ref = _parity(m2, {"in": blob}, rtol=1e-4, atol=1e-5)
        assert ref["mask"].shape == (1, 2, 16, 16)
        q = compile_model(m2, Config(quant=QuantMode.INT8_WEIGHT))
        assert np.all(np.isfinite(q.infer({"in": blob})["mask"]))


class TestRound2Batch2Ops:
    """FakeQuantize / NormalizeL2 / Tile / DepthToSpace / SpaceToDepth
    / ReduceMin / ReduceProd + the unary fill-ins (Erf, Log, Abs,
    Negative, Floor, Ceiling) — the ops POT/NNCF-quantized and
    super-resolution IRs carry."""

    @pytest.mark.parametrize("op,fn", [
        ("Log", np.log), ("Abs", np.abs), ("Negative", np.negative),
        ("Floor", np.floor), ("Ceiling", np.ceil),
    ])
    def test_unary_fillins(self, op, fn):
        rng = np.random.default_rng(11)
        b = GraphBuilder(op.lower())
        x = b.parameter("in", (1, 3, 5, 5))
        b.result(b.unary(op, x), name="out")
        m = b.build()
        blob = rng.uniform(0.1, 3.0, (1, 3, 5, 5)).astype(np.float32)
        ref = _parity(m, {"in": blob})
        np.testing.assert_allclose(next(iter(ref.values())), fn(blob),
                                   rtol=1e-5, atol=1e-6)

    def test_erf(self):
        from scipy.special import erf

        rng = np.random.default_rng(12)
        b = GraphBuilder("erf")
        x = b.parameter("in", (1, 2, 4, 4))
        b.result(b.unary("Erf", x), name="out")
        blob = rng.normal(0, 2, (1, 2, 4, 4)).astype(np.float32)
        ref = _parity(b.build(), {"in": blob})
        np.testing.assert_allclose(next(iter(ref.values())), erf(blob),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("kind,fn", [("Min", np.min),
                                         ("Prod", np.prod)])
    def test_reduce_min_prod(self, kind, fn):
        rng = np.random.default_rng(13)
        b = GraphBuilder("red")
        x = b.parameter("in", (2, 3, 4, 5))
        b.result(b.reduce(kind, x, axes=(1, 3), keep_dims=True),
                 name="out")
        blob = rng.uniform(0.5, 1.5, (2, 3, 4, 5)).astype(np.float32)
        ref = _parity(b.build(), {"in": blob}, rtol=1e-4)
        np.testing.assert_allclose(
            next(iter(ref.values())),
            fn(blob, axis=(1, 3), keepdims=True), rtol=1e-4)

    def test_tile(self):
        rng = np.random.default_rng(14)
        b = GraphBuilder("tile")
        x = b.parameter("in", (1, 2, 3, 4))
        b.result(b.tile(x, (1, 2, 1, 3)), name="full")
        b.result(b.tile(x, (2,)), name="short")  # left-padded with 1s
        m = b.build()
        blob = rng.normal(0, 1, (1, 2, 3, 4)).astype(np.float32)
        ref = _parity(m, {"in": blob})
        assert ref["full"].shape == (1, 4, 3, 12)
        assert ref["short"].shape == (1, 2, 3, 8)
        np.testing.assert_allclose(ref["full"], np.tile(blob, (1, 2, 1, 3)))

    @pytest.mark.parametrize("eps_mode", ["add", "max"])
    def test_normalize_l2(self, eps_mode):
        rng = np.random.default_rng(15)
        b = GraphBuilder("nl2")
        x = b.parameter("in", (1, 8, 6, 6))
        b.result(b.normalize_l2(x, axes=(1,), eps=1e-8,
                                eps_mode=eps_mode), name="out")
        blob = rng.normal(0, 2, (1, 8, 6, 6)).astype(np.float32)
        ref = _parity(b.build(), {"in": blob}, rtol=1e-4)
        out = next(iter(ref.values()))
        ss = np.sum(blob * blob, axis=1, keepdims=True)
        denom = np.sqrt(ss + 1e-8) if eps_mode == "add" else np.sqrt(
            np.maximum(ss, 1e-8))
        np.testing.assert_allclose(out, blob / denom, rtol=1e-4,
                                   atol=1e-6)
        # unit L2 norm per pixel across channels
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.ones((1, 6, 6)), rtol=1e-3)

    def test_fake_quantize_grid_and_per_channel(self):
        rng = np.random.default_rng(16)
        b = GraphBuilder("fq")
        x = b.parameter("in", (1, 2, 4, 4))
        # per-channel ranges — the shape POT emits for weights/acts
        il = np.array([-1.0, -2.0], np.float32).reshape(1, 2, 1, 1)
        ih = np.array([1.0, 2.0], np.float32).reshape(1, 2, 1, 1)
        b.result(b.fake_quantize(x, il, ih, il, ih, levels=256),
                 name="out")
        blob = rng.uniform(-3, 3, (1, 2, 4, 4)).astype(np.float32)
        ref = _parity(b.build(), {"in": blob}, rtol=1e-5, atol=1e-6)
        out = next(iter(ref.values()))
        # every output sits on its channel's 256-level grid within range
        for c in range(2):
            lo, hi = il[0, c, 0, 0], ih[0, c, 0, 0]
            codes = (out[0, c] - lo) / (hi - lo) * 255
            np.testing.assert_allclose(codes, np.round(codes), atol=1e-3)
            assert out[0, c].min() >= lo and out[0, c].max() <= hi

    def test_fake_quantize_vs_torch(self):
        import torch

        rng = np.random.default_rng(17)
        s = 0.05
        il, ih = -128 * s, 127 * s
        b = GraphBuilder("fqt")
        x = b.parameter("in", (1, 3, 8, 8))
        b.result(b.fake_quantize(x, il, ih, il, ih, levels=256),
                 name="out")
        blob = rng.uniform(-8, 8, (1, 3, 8, 8)).astype(np.float32)
        ref = _parity(b.build(), {"in": blob})
        want = torch.fake_quantize_per_tensor_affine(
            torch.from_numpy(blob), scale=s, zero_point=128,
            quant_min=0, quant_max=255).numpy()
        np.testing.assert_allclose(next(iter(ref.values())), want,
                                   rtol=1e-5, atol=1e-5)

    def test_fake_quantize_binarization(self):
        b = GraphBuilder("fq2")
        x = b.parameter("in", (1, 1, 2, 2))
        b.result(b.fake_quantize(x, 0.0, 1.0, 0.0, 1.0, levels=2),
                 name="out")
        blob = np.array([[0.2, 0.6], [0.49, 0.51]],
                        np.float32).reshape(1, 1, 2, 2)
        ref = _parity(b.build(), {"in": blob})
        np.testing.assert_allclose(
            next(iter(ref.values())).reshape(-1), [0, 1, 0, 1])

    @pytest.mark.parametrize("mode", ["blocks_first", "depth_first"])
    def test_depth_space_round_trip(self, mode):
        rng = np.random.default_rng(18)
        b = GraphBuilder("d2s")
        x = b.parameter("in", (1, 4, 4, 6))
        d = b.depth_to_space(b.space_to_depth(x, 2, mode=mode), 2,
                             mode=mode)
        b.result(d, name="rt")
        b.result(b.space_to_depth(x, 2, mode=mode), name="s2d")
        m = b.build()
        blob = rng.normal(0, 1, (1, 4, 4, 6)).astype(np.float32)
        ref = _parity(m, {"in": blob})
        np.testing.assert_allclose(ref["rt"], blob)  # exact inverse
        assert ref["s2d"].shape == (1, 16, 2, 3)

    def test_pixel_shuffle_matches_torch(self):
        """torch.pixel_shuffle is DepthToSpace depth_first (CRD);
        pixel_unshuffle is SpaceToDepth depth_first."""
        import torch

        rng = np.random.default_rng(19)
        b = GraphBuilder("ps")
        x = b.parameter("in", (1, 12, 4, 4))
        b.result(b.depth_to_space(x, 2, mode="depth_first"), name="out")
        blob = rng.normal(0, 1, (1, 12, 4, 4)).astype(np.float32)
        ref = _parity(b.build(), {"in": blob})
        want = torch.pixel_shuffle(torch.from_numpy(blob), 2).numpy()
        np.testing.assert_allclose(next(iter(ref.values())), want)

    def test_invalid_configs_fail_fast(self):
        b = GraphBuilder("bad")
        x = b.parameter("in", (1, 3, 4, 4))
        with pytest.raises(ValueError, match="divisible"):
            b.depth_to_space(x, 2)          # C=3 not divisible by 4
        with pytest.raises(ValueError, match="divisible"):
            b.space_to_depth(x, 3)          # H=4 not divisible by 3
        with pytest.raises(ValueError, match="levels"):
            b.fake_quantize(x, 0.0, 1.0, 0.0, 1.0, levels=1)
        with pytest.raises(ValueError, match="repeats"):
            b.tile(x, (0, 1, 1, 1))
        with pytest.raises(ValueError, match="eps_mode"):
            b.normalize_l2(x, axes=(1,), eps_mode="clip")

    def test_new_ops_survive_writer_parser_round_trip(self, tmp_path):
        from pyopenvino_tpu.ir import read_ir_model
        from pyopenvino_tpu.ir.writer import write_ir_model

        rng = np.random.default_rng(20)
        b = GraphBuilder("rt2")
        x = b.parameter("in", (1, 4, 4, 4))
        y = b.fake_quantize(x, -2.0, 2.0, -2.0, 2.0, levels=16)
        y = b.normalize_l2(y, axes=(1,))
        y = b.space_to_depth(y, 2)
        y = b.tile(b.unary("Abs", y), (1, 1, 2, 2))
        y = b.reduce("Min", y, axes=(2, 3), keep_dims=False)
        b.result(y, name="out")
        m = b.build()
        path = str(tmp_path / "rt2.xml")
        write_ir_model(m, path)
        m2 = read_ir_model(path, path[:-4] + ".bin")
        blob = rng.normal(0, 1.5, (1, 4, 4, 4)).astype(np.float32)
        ref = Interpreter(m).run({"in": blob})
        got = Interpreter(m2).run({"in": blob})
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-6)
        _parity(m2, {"in": blob}, rtol=1e-4)


class TestFoldFakeQuantize:
    """passes/fold_fq.py — POT-style weight-FQ chains collapse to plain
    Consts at compile time; activation FQ stays as exact emulation."""

    def _pot_graph(self):
        rng = np.random.default_rng(21)
        b = GraphBuilder("pot")
        x = b.parameter("in", (1, 4, 8, 8))
        w = rng.normal(0, 0.3, (8, 4, 3, 3)).astype(np.float32)
        hi = np.abs(w).max(axis=(1, 2, 3), keepdims=True).astype(np.float32)
        wq = b.fake_quantize(b.const(w), -hi, hi, -hi, hi, levels=256)
        # activation-side FQ in front of the conv stays in the graph
        xq = b.fake_quantize(x, -4.0, 4.0, -4.0, 4.0, levels=256)
        y = b.conv2d(xq, wq, pads=((1, 1), (1, 1)))
        b.result(b.relu(y), name="out")
        return b.build(), rng

    def test_weight_fq_folds_and_matches_interpreter(self):
        from pyopenvino_tpu.passes.fold_fq import fold_fake_quantize

        m, rng = self._pot_graph()
        assert len(m.find_by_type("FakeQuantize")) == 2
        folded = fold_fake_quantize(m)
        # weight FQ gone (plus its range consts), activation FQ kept
        assert len(folded.find_by_type("FakeQuantize")) == 1
        assert len(folded.find_by_type("Const")) < len(
            m.find_by_type("Const"))
        blob = rng.uniform(-3, 3, (1, 4, 8, 8)).astype(np.float32)
        ref = Interpreter(m).run({"in": blob})         # unfolded
        got = Interpreter(folded).run({"in": blob})    # folded
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-6)
        # and through the compiled path (compile_model folds internally)
        _parity(m, {"in": blob}, rtol=1e-4, atol=1e-5)

    def test_int8_weight_quant_engages_on_pot_ir(self):
        m, rng = self._pot_graph()
        blob = rng.uniform(-3, 3, (1, 4, 8, 8)).astype(np.float32)
        ref = compile_model(m, Config()).infer({"in": blob})
        net = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
        # the conv weight IS quantized (folding exposed the Const)
        assert net._quantized, "weight-FQ fold did not expose the weight"
        out = net.infer({"in": blob})
        k = next(iter(ref))
        # the 256-level FQ grid and the 255-code int8 grid do not
        # coincide, so requantization re-rounds by up to half an int8
        # step per weight — near-lossless at feature-map scale
        err = np.abs(out[k] - ref[k])
        assert float(err.mean()) < 0.01 * float(
            np.abs(ref[k]).mean() + 1e-6), err.mean()
        assert float(err.max()) < 0.15, err.max()

    def test_shared_weight_const_not_folded(self):
        rng = np.random.default_rng(22)
        b = GraphBuilder("shared")
        x = b.parameter("in", (1, 2, 4, 4))
        w = b.const(rng.normal(0, 0.3, (2, 2, 1, 1)).astype(np.float32))
        wq = b.fake_quantize(w, -1.0, 1.0, -1.0, 1.0, levels=16)
        y1 = b.conv2d(x, wq)
        y2 = b.conv2d(x, w)  # raw weight reused elsewhere
        b.result(b.add(y1, y2), name="out")
        m = b.build()
        from pyopenvino_tpu.passes.fold_fq import fold_fake_quantize

        folded = fold_fake_quantize(m)
        assert len(folded.find_by_type("FakeQuantize")) == 1  # kept
        blob = rng.normal(0, 1, (1, 2, 4, 4)).astype(np.float32)
        _parity(m, {"in": blob})


def test_convert_dtypes_and_roundtrip(tmp_path):
    """Convert (opset1): u8→f32 in, f32→i32 truncation-toward-zero out,
    interpreter↔XLA parity, plus writer→parser round-trip."""
    rng = np.random.default_rng(7)
    b = GraphBuilder("conv_dtype")
    x = b.parameter("in", (1, 3, 4, 4), dtype=np.uint8)
    f = b.convert(x, "f32")
    y = b.multiply(f, b.const(np.float32(0.5)))
    b.result(y, name="scaled")
    b.result(b.convert(y, "i32"), name="truncated")
    m = b.build()

    blob = rng.integers(0, 256, (1, 3, 4, 4), dtype=np.uint8)
    ref = Interpreter(m).run({"in": blob})
    np.testing.assert_allclose(ref["scaled"], blob.astype(np.float32) * 0.5)
    # float→int rounds toward zero (C truncation)
    np.testing.assert_array_equal(
        ref["truncated"], (blob.astype(np.float32) * 0.5).astype(np.int32))
    assert ref["truncated"].dtype == np.int32

    got = compile_model(m, Config(backend=Backend.XLA)).infer({"in": blob})
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-6, atol=1e-6)
    assert np.asarray(got["truncated"]).dtype == np.int32

    # writer → parser round-trip keeps destination_type and port dtypes
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model

    xml = str(tmp_path / "conv_dtype.xml")
    write_ir_model(m, xml)
    m2 = read_ir_model(xml, xml[:-4] + ".bin")
    ref2 = Interpreter(m2).run({"in": blob})
    for k in ref:
        np.testing.assert_allclose(ref2[k], ref[k])


def test_convert_constant_folds():
    """A Const→Convert chain folds at compile time (no runtime cast)."""
    b = GraphBuilder("conv_fold")
    x = b.parameter("in", (1, 2, 2, 2))
    half = b.convert(b.const(np.array([2], np.int64)), "f32")
    b.result(b.multiply(x, half), name="out")
    m = b.build()
    blob = np.ones((1, 2, 2, 2), np.float32)
    out = compile_model(m, Config(backend=Backend.XLA)).infer({"in": blob})
    np.testing.assert_allclose(out["out"], blob * 2.0)


class TestComparisonLogical:
    """opset1 comparison/logical set: bool outputs, numpy broadcasting,
    interpreter↔XLA parity — the mask producers feeding Select."""

    CASES = [
        ("Equal", np.equal), ("NotEqual", np.not_equal),
        ("Greater", np.greater), ("GreaterEqual", np.greater_equal),
        ("Less", np.less), ("LessEqual", np.less_equal),
    ]

    def _model(self, op_type, sa, sb):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("cmp")
        x = b.parameter("x", sa)
        y = b.parameter("y", sb)
        b.result(b.compare(op_type, x, y), "out")
        return b.build()

    @pytest.mark.parametrize("op_type,np_fn", CASES)
    def test_parity_and_broadcast(self, op_type, np_fn):
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        m = self._model(op_type, (2, 3), (1, 3))
        rng = np.random.default_rng(0)
        x = rng.integers(0, 3, (2, 3)).astype(np.float32)
        y = rng.integers(0, 3, (1, 3)).astype(np.float32)
        want = np_fn(x, y)
        ref = Interpreter(m).run({"x": x, "y": y})["out"]
        got = compile_model(m, Config())({"x": x, "y": y})["out"]
        np.testing.assert_array_equal(ref, want)
        np.testing.assert_array_equal(np.asarray(got, bool), want)

    def test_logical_chain_feeding_select(self):
        """(x > 0) AND NOT(y > 0) ? x : y — the exported-graph mask idiom
        end to end."""
        from pyopenvino_tpu.ir.builder import GraphBuilder
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        b = GraphBuilder("mask")
        x = b.parameter("x", (2, 4))
        y = b.parameter("y", (2, 4))
        zero = b.const(np.zeros((1, 1), np.float32))
        cond = b.compare("LogicalAnd", b.compare("Greater", x, zero),
                         b.logical_not(b.compare("Greater", y, zero)))
        b.result(b.select(cond, x, y), "out")
        m = b.build()
        rng = np.random.default_rng(1)
        xv = rng.standard_normal((2, 4)).astype(np.float32)
        yv = rng.standard_normal((2, 4)).astype(np.float32)
        want = np.where((xv > 0) & ~(yv > 0), xv, yv)
        np.testing.assert_array_equal(
            Interpreter(m).run({"x": xv, "y": yv})["out"], want)
        np.testing.assert_allclose(
            compile_model(m, Config())({"x": xv, "y": yv})["out"], want)


class TestGatherND:
    def _model(self, dshape, ishape, bd=0):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("gnd")
        d = b.parameter("d", dshape)
        i = b.parameter("i", ishape, dtype=np.int32)
        b.result(b.gather_nd(d, i, batch_dims=bd), "out")
        return b.build()

    def _run(self, dshape, ishape, bd, d, i):
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        m = self._model(dshape, ishape, bd)
        ref = Interpreter(m).run({"d": d, "i": i})["out"]
        got = compile_model(m, Config())({"d": d, "i": i})["out"]
        np.testing.assert_allclose(got, ref, rtol=1e-6)
        return ref

    def test_coordinate_gather(self):
        rng = np.random.default_rng(0)
        d = rng.standard_normal((4, 5, 6)).astype(np.float32)
        i = np.asarray([[0, 1], [3, 4], [2, 0]], np.int32)  # (3, 2)
        ref = self._run((4, 5, 6), (3, 2), 0, d, i)
        assert ref.shape == (3, 6)
        np.testing.assert_allclose(ref[1], d[3, 4])

    def test_full_depth_scalar_gather(self):
        rng = np.random.default_rng(1)
        d = rng.standard_normal((3, 4)).astype(np.float32)
        i = np.asarray([[2, 3], [0, 0]], np.int32)
        ref = self._run((3, 4), (2, 2), 0, d, i)
        np.testing.assert_allclose(ref, [d[2, 3], d[0, 0]])

    def test_batch_dims(self):
        rng = np.random.default_rng(2)
        d = rng.standard_normal((2, 5, 6)).astype(np.float32)
        i = rng.integers(0, 5, (2, 3, 1)).astype(np.int32)
        ref = self._run((2, 5, 6), (2, 3, 1), 1, d, i)
        assert ref.shape == (2, 3, 6)
        np.testing.assert_allclose(ref[1, 2], d[1, i[1, 2, 0]])

    def test_depth_validation(self):
        with pytest.raises(ValueError, match="exceeds data rank"):
            self._model((2, 3), (2, 3), 1)


def test_gather_elements_take_along_axis():
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(3)
    d = rng.standard_normal((3, 5)).astype(np.float32)
    i = rng.integers(0, 5, (3, 2)).astype(np.int32)
    b = GraphBuilder("ge")
    dp = b.parameter("d", (3, 5))
    ip = b.parameter("i", (3, 2), dtype=np.int32)
    b.result(b.gather_elements(dp, ip, axis=1), "out")
    m = b.build()
    want = np.take_along_axis(d, i.astype(np.int64), axis=1)
    np.testing.assert_allclose(
        Interpreter(m).run({"d": d, "i": i})["out"], want)
    np.testing.assert_allclose(
        compile_model(m, Config())({"d": d, "i": i})["out"], want)


def test_scatter_nd_update():
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(4)
    d = rng.standard_normal((4, 3)).astype(np.float32)
    idx = np.asarray([[0], [2]], np.int32)
    upd = np.asarray([[9, 9, 9], [7, 7, 7]], np.float32)
    b = GraphBuilder("snd")
    dp = b.parameter("d", (4, 3))
    ip = b.parameter("i", (2, 1), dtype=np.int32)
    up = b.parameter("u", (2, 3))
    b.result(b.scatter_nd_update(dp, ip, up), "out")
    m = b.build()
    want = d.copy(); want[0] = 9; want[2] = 7
    feeds = {"d": d, "i": idx, "u": upd}
    np.testing.assert_allclose(Interpreter(m).run(feeds)["out"], want)
    np.testing.assert_allclose(
        compile_model(m, Config())(feeds)["out"], want)
    # shape validation
    b2 = GraphBuilder("bad")
    dp2 = b2.parameter("d", (4, 3))
    ip2 = b2.parameter("i", (2, 1), dtype=np.int32)
    up2 = b2.parameter("u", (2, 2))
    with pytest.raises(ValueError, match="updates shape"):
        b2.scatter_nd_update(dp2, ip2, up2)


class TestMiscOpsetBatch:
    """ReduceL1/L2, Broadcast, Range, CumSum — the remaining small-op
    batch; every op checked interpreter vs XLA."""

    def _both(self, build, feeds):
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        m = build()
        ref = Interpreter(m).run(feeds)["out"]
        got = compile_model(m, Config())(feeds)["out"]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        return ref

    def test_reduce_l1_l2(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        for kind, np_fn in (
            ("L1", lambda v: np.abs(v).sum(axis=(1, 2))),
            ("L2", lambda v: np.sqrt((v ** 2).sum(axis=(1, 2)))),
        ):
            def build():
                b = GraphBuilder("r")
                p = b.parameter("x", (2, 3, 4))
                b.result(b.reduce(kind.capitalize() if kind[0] != "L"
                                  else kind, p, axes=(1, 2),
                                  keep_dims=False), "out")
                return b.build()

            ref = self._both(build, {"x": x})
            np.testing.assert_allclose(ref, np_fn(x), rtol=1e-5)

    def test_broadcast_modes(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        x = np.arange(3, dtype=np.float32).reshape(1, 3)

        def build():
            b = GraphBuilder("bc")
            p = b.parameter("x", (1, 3))
            t = b.const(np.asarray([4, 3], np.int64))
            b.result(b._add_node("Broadcast", [p, t],
                                 {"mode": "numpy"}), "out")
            return b.build()

        ref = self._both(build, {"x": x})
        np.testing.assert_allclose(ref, np.broadcast_to(x, (4, 3)))

        def build2():
            b = GraphBuilder("bc2")
            p = b.parameter("x", (2, 1, 3))
            t = b.const(np.asarray([5, 1], np.int64))
            b.result(b._add_node("Broadcast", [p, t],
                                 {"mode": "bidirectional"}), "out")
            return b.build()

        x2 = np.arange(6, dtype=np.float32).reshape(2, 1, 3)
        ref2 = self._both(build2, {"x": x2})
        assert ref2.shape == (2, 5, 3)

    def test_range_folds(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        def build():
            b = GraphBuilder("rg")
            x = b.parameter("x", (1, 4))
            r = b._add_node("Range", [
                b.const(np.asarray(0.0, np.float32)),
                b.const(np.asarray(4.0, np.float32)),
                b.const(np.asarray(1.0, np.float32)),
            ], {"output_type": "f32"})
            b.result(b.add(x, b.reshape(r, (1, 4))), "out")
            return b.build()

        x = np.zeros((1, 4), np.float32)
        ref = self._both(build, {"x": x})
        np.testing.assert_allclose(ref, [[0, 1, 2, 3]])

    @pytest.mark.parametrize("exclusive", [False, True])
    @pytest.mark.parametrize("reverse", [False, True])
    def test_cumsum(self, exclusive, reverse):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 5)).astype(np.float32)

        def build():
            b = GraphBuilder("cs")
            p = b.parameter("x", (3, 5))
            ax = b.const(np.asarray(1, np.int64))
            b.result(b._add_node("CumSum", [p, ax], {
                "exclusive": "1" if exclusive else "0",
                "reverse": "1" if reverse else "0",
            }), "out")
            return b.build()

        ref = self._both(build, {"x": x})
        v = x[:, ::-1] if reverse else x
        want = np.cumsum(v, axis=1)
        if exclusive:
            want = np.concatenate(
                [np.zeros((3, 1), np.float32), want[:, :-1]], axis=1)
        if reverse:
            want = want[:, ::-1]
        np.testing.assert_allclose(ref, want, rtol=1e-5, atol=1e-6)


class TestSpaceBatch:
    """SpaceToBatch/BatchToSpace — the TF dilated-conv lowering pair,
    validated against tf.space_to_batch_nd itself plus both twins."""

    def test_against_tensorflow_and_roundtrip(self):
        tf = pytest.importorskip("tensorflow")
        from pyopenvino_tpu.ir.builder import GraphBuilder
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 3, 6, 8)).astype(np.float32)
        block = [1, 1, 2, 4]
        pb, pe = [0, 0, 2, 0], [0, 0, 0, 4]

        b = GraphBuilder("sb")
        p = b.parameter("x", (2, 3, 6, 8))
        s2b = b.space_to_batch(p, block, pb, pe)
        b.result(s2b, "s2b")
        b.result(b.batch_to_space(s2b, block, pb, pe), "round")
        m = b.build()
        ref = Interpreter(m).run({"x": x})
        got = compile_model(m, Config())({"x": x})
        want = tf.space_to_batch_nd(
            x, block_shape=block[1:],
            paddings=np.stack([pb[1:], pe[1:]], 1)).numpy()
        np.testing.assert_allclose(ref["s2b"], want, rtol=1e-6)
        np.testing.assert_allclose(got["s2b"], want, rtol=1e-6)
        np.testing.assert_allclose(ref["round"], x, rtol=1e-6)
        np.testing.assert_allclose(got["round"], x, rtol=1e-6)

    def test_nonconst_block_refused(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("bad")
        x = b.parameter("x", (2, 3, 4, 4))
        blk = b.parameter("blk", (4,), dtype=np.int64)
        zero = b.const(np.zeros(4, np.int64))
        with pytest.raises(ValueError, match="must be"):
            b._add_node("SpaceToBatch", [x, blk, zero, zero], {}, "s")


def test_block_op_and_scatter_validation_regressions():
    """Fourth-review regressions: spec-invariant/divisibility validation
    at BUILD time with named errors, and the Range builder's declared
    dtype honoring output_type."""
    from pyopenvino_tpu.ir.builder import GraphBuilder

    b = GraphBuilder("v")
    x = b.parameter("x", (2, 4))
    with pytest.raises(ValueError, match="block\\[0\\] must be 1"):
        b.space_to_batch(x, (2, 2), (0, 0), (0, 0))
    with pytest.raises(ValueError, match="not divisible by block"):
        b.space_to_batch(x, (1, 3), (0, 0), (0, 0))
    x5 = b.parameter("x5", (5, 4))
    with pytest.raises(ValueError, match="not\\s+divisible by prod"):
        b.batch_to_space(x5, (1, 2), (0, 0), (0, 0))
    d = b.parameter("d", (4, 3))
    i3 = b.parameter("i3", (2, 3), dtype=np.int32)
    u = b.parameter("u", (2,))
    with pytest.raises(ValueError, match="exceeds data rank"):
        b.scatter_nd_update(d, i3, u)
    ib = b.parameter("ib", (5, 2), dtype=np.int32)  # off-axis 5 != 4
    with pytest.raises(ValueError, match="must match"):
        b.gather_elements(d, ib, axis=1)

    r = b.range_(0, 4, 1, output_type="i32")
    assert r.dtype == np.int32 and r.shape == (4,)


def test_gather_nd_opset5_flattened_batch():
    """An IR declaring GatherND version=opset5 flattens the batch dims in
    the output (the parser retains the layer version as _opset)."""
    import tempfile

    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.ir.writer import write_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(6)
    d = rng.standard_normal((2, 3, 5, 6)).astype(np.float32)
    i = rng.integers(0, 5, (2, 3, 4, 1)).astype(np.int32)

    b = GraphBuilder("g5")
    dp = b.parameter("d", (2, 3, 5, 6))
    ip = b.parameter("i", (2, 3, 4, 1), dtype=np.int32)
    node = b._add_node("GatherND", [dp, ip],
                       {"batch_dims": "2", "_opset": "opset5"})
    b.result(node, "out")
    m = b.build()
    ref = Interpreter(m).run({"d": d, "i": i})["out"]
    got = compile_model(m, Config())({"d": d, "i": i})["out"]
    assert ref.shape == (6, 4, 6)  # opset5: (2,3) batch dims flattened
    np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestEinsumAndFriends:
    def _both(self, build, feeds, atol=1e-5):
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        m = build()
        ref = Interpreter(m).run(feeds)["out"]
        got = compile_model(m, Config())(feeds)["out"]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=atol)
        return ref

    def test_einsum_attention_shape(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(0)
        q = rng.standard_normal((2, 4, 8)).astype(np.float32)
        k = rng.standard_normal((2, 5, 8)).astype(np.float32)

        def build():
            b = GraphBuilder("es")
            qp = b.parameter("q", (2, 4, 8))
            kp = b.parameter("k", (2, 5, 8))
            b.result(b._add_node("Einsum", [qp, kp],
                                 {"equation": "bqd,bkd->bqk"}), "out")
            return b.build()

        ref = self._both(build, {"q": q, "k": k})
        np.testing.assert_allclose(
            ref, np.einsum("bqd,bkd->bqk", q, k), rtol=1e-4, atol=1e-5)

    def test_einsum_bad_equation_fails_fast(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("bad")
        x = b.parameter("x", (2, 3))
        with pytest.raises(ValueError, match="bad equation"):
            b._add_node("Einsum", [x], {"equation": "ij,jk->ik"})

    def test_hard_sigmoid(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        x = np.linspace(-3, 3, 13).astype(np.float32).reshape(1, 13)

        def build():
            b = GraphBuilder("hs")
            p = b.parameter("x", (1, 13))
            b.result(b._add_node("HardSigmoid", [
                p, b.const(np.float32(0.4)), b.const(np.float32(0.3))
            ], {}), "out")
            return b.build()

        ref = self._both(build, {"x": x})
        np.testing.assert_allclose(
            ref, np.clip(0.4 * x + 0.3, 0, 1), rtol=1e-6)

    def test_log_softmax(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(1)
        x = (rng.standard_normal((3, 7)) * 20).astype(np.float32)

        def build():
            b = GraphBuilder("ls")
            p = b.parameter("x", (3, 7))
            b.result(b._add_node("LogSoftmax", [p], {"axis": "1"}), "out")
            return b.build()

        ref = self._both(build, {"x": x}, atol=1e-4)
        np.testing.assert_allclose(
            np.exp(ref).sum(axis=1), np.ones(3), rtol=1e-5)


def test_trig_family_and_round_and_shuffle():
    """Sin..Atanh + Sign + Round(half_to_even) + ShuffleChannels —
    interpreter vs XLA on every op."""
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, (2, 8)).astype(np.float32)
    for op, np_fn in [
        ("Sin", np.sin), ("Cos", np.cos), ("Tan", np.tan),
        ("Asin", np.arcsin), ("Acos", np.arccos), ("Atan", np.arctan),
        ("Sinh", np.sinh), ("Cosh", np.cosh), ("Atanh", np.arctanh),
        ("Sign", np.sign), ("Round", np.rint),
    ]:
        b = GraphBuilder(op.lower())
        p = b.parameter("x", (2, 8))
        b.result(b.unary(op, p), "out")
        m = b.build()
        want = np_fn(x).astype(np.float32)
        np.testing.assert_allclose(
            Interpreter(m).run({"x": x})["out"], want, rtol=1e-5,
            atol=1e-6, err_msg=op)
        np.testing.assert_allclose(
            compile_model(m, Config())({"x": x})["out"], want,
            rtol=1e-4, atol=1e-5, err_msg=op)

    # Acosh/Asinh need their own domains
    xa = rng.uniform(1.1, 3.0, (2, 8)).astype(np.float32)
    for op, np_fn in [("Acosh", np.arccosh), ("Asinh", np.arcsinh)]:
        b = GraphBuilder(op.lower())
        p = b.parameter("x", (2, 8))
        b.result(b.unary(op, p), "out")
        m = b.build()
        np.testing.assert_allclose(
            compile_model(m, Config())({"x": xa})["out"],
            np_fn(xa).astype(np.float32), rtol=1e-4, atol=1e-5,
            err_msg=op)

    # ShuffleChannels == the reshape/transpose shuffle
    xs = rng.standard_normal((1, 12, 3, 3)).astype(np.float32)
    b = GraphBuilder("sc")
    p = b.parameter("x", (1, 12, 3, 3))
    b.result(b._add_node("ShuffleChannels", [p],
                         {"axis": "1", "group": "3"}), "out")
    m = b.build()
    want = xs.reshape(1, 3, 4, 3, 3).transpose(0, 2, 1, 3, 4).reshape(
        1, 12, 3, 3)
    np.testing.assert_allclose(Interpreter(m).run({"x": xs})["out"], want)
    np.testing.assert_allclose(
        compile_model(m, Config())({"x": xs})["out"], want, rtol=1e-6)
    bb = GraphBuilder("bad")
    pb = bb.parameter("x", (1, 10, 2, 2))
    with pytest.raises(ValueError, match="not divisible"):
        bb._add_node("ShuffleChannels", [pb], {"axis": "1", "group": "3"})


def test_einsum_shape_arithmetic_no_materialization():
    """Einsum output shapes come from label arithmetic: implicit outputs
    follow the numpy sorted-once rule and one ellipsis per operand
    broadcasts — no dummy tensors are built (the old dummy-evaluation
    path cost real FLOPs per shape-inference pass)."""
    from pyopenvino_tpu.ops.extended import _einsum_out_shape

    assert _einsum_out_shape("ij,jk->ik", [(2, 3), (3, 4)]) == (2, 4)
    assert _einsum_out_shape("ij,jk", [(2, 3), (3, 4)]) == (2, 4)
    assert _einsum_out_shape("ii", [(5, 5)]) == ()
    assert _einsum_out_shape("...ij,...jk->...ik",
                             [(7, 1, 2, 3), (4, 3, 5)]) == (7, 4, 2, 5)
    assert _einsum_out_shape("bqd,bkd->bqk",
                             [(2, 4, 8), (2, 5, 8)]) == (2, 4, 5)
    with pytest.raises(ValueError, match="bound to both"):
        _einsum_out_shape("ij,jk->ik", [(2, 3), (4, 5)])
    with pytest.raises(ValueError, match="not present"):
        _einsum_out_shape("ij->iz", [(2, 3)])


def test_round_half_away_from_zero():
    """Both opset5 Round modes at the tie points, on both executors."""
    from pyopenvino_tpu.ir.builder import GraphBuilder

    x = np.asarray([[-2.5, -1.5, -0.5, 0.5, 1.5, 2.5, 1.2, -1.2]],
                   np.float32)
    b = GraphBuilder("rm")
    p = b.parameter("x", (1, 8))
    b.result(b._add_node("Round", [p], {"mode": "half_away_from_zero"}),
             "afz")
    b.result(b._add_node("Round", [p], {"mode": "half_to_even"}), "even")
    m = b.build()
    ref = Interpreter(m).run({"x": x})
    np.testing.assert_array_equal(
        ref["afz"], [[-3.0, -2.0, -1.0, 1.0, 2.0, 3.0, 1.0, -1.0]])
    np.testing.assert_array_equal(
        ref["even"], [[-2.0, -2.0, -0.0, 0.0, 2.0, 2.0, 1.0, -1.0]])
    got = compile_model(m, Config(backend=Backend.XLA))({"x": x})
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_round_bad_mode_fails_at_build():
    from pyopenvino_tpu.ir.builder import GraphBuilder

    b = GraphBuilder("rm")
    x = b.parameter("x", (1, 4))
    with pytest.raises(ValueError, match="unknown mode"):
        b._add_node("Round", [x], {"mode": "half_down"})


def test_selu_softsign():
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 9)).astype(np.float32)

    b = GraphBuilder("selu")
    p = b.parameter("x", (2, 9))
    b.result(b._add_node("Selu", [
        p, b.const(np.float32(1.6733)), b.const(np.float32(1.0507))
    ], {}), "out")
    m = b.build()
    want = 1.0507 * np.where(x > 0, x, 1.6733 * (np.exp(x) - 1))
    np.testing.assert_allclose(
        Interpreter(m).run({"x": x})["out"], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        compile_model(m, Config())({"x": x})["out"], want, rtol=1e-4,
        atol=1e-5)

    b2 = GraphBuilder("ss")
    p2 = b2.parameter("x", (2, 9))
    b2.result(b2.unary("SoftSign", p2), "out")
    m2 = b2.build()
    want2 = x / (1 + np.abs(x))
    np.testing.assert_allclose(
        Interpreter(m2).run({"x": x})["out"], want2, rtol=1e-6)
    np.testing.assert_allclose(
        compile_model(m2, Config())({"x": x})["out"], want2, rtol=1e-5,
        atol=1e-6)


def test_mod_family_and_reverse_sequence():
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(8)
    a = (rng.standard_normal((2, 6)) * 5).astype(np.float32)
    bb = np.where(np.abs(rng.standard_normal((2, 6))) < 0.1, 1.0,
                  rng.standard_normal((2, 6)) * 3).astype(np.float32)
    for op, np_fn in [("FloorMod", np.mod), ("Mod", np.fmod),
                      ("SquaredDifference", lambda x, y: (x - y) ** 2)]:
        b = GraphBuilder(op.lower())
        pa = b.parameter("a", (2, 6))
        pb = b.parameter("b", (2, 6))
        b.result(b._add_node(op, [pa, pb],
                             {"auto_broadcast": "numpy"}), "out")
        m = b.build()
        want = np_fn(a, bb).astype(np.float32)
        np.testing.assert_allclose(
            Interpreter(m).run({"a": a, "b": bb})["out"], want,
            rtol=1e-5, atol=1e-5, err_msg=op)
        np.testing.assert_allclose(
            compile_model(m, Config())({"a": a, "b": bb})["out"], want,
            rtol=1e-4, atol=1e-4, err_msg=op)

    # ReverseSequence: rows reverse only their first seq_lengths[b] steps
    x = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
    lens = np.asarray([3, 5], np.int32)
    b = GraphBuilder("rs")
    px = b.parameter("x", (2, 5, 3))
    pl = b.parameter("l", (2,), dtype=np.int32)
    b.result(b._add_node("ReverseSequence", [px, pl],
                         {"batch_axis": "0", "seq_axis": "1"}), "out")
    m = b.build()
    want = x.copy()
    want[0, :3] = x[0, :3][::-1]
    want[1, :5] = x[1, :5][::-1]
    np.testing.assert_allclose(
        Interpreter(m).run({"x": x, "l": lens})["out"], want)
    np.testing.assert_allclose(
        compile_model(m, Config())({"x": x, "l": lens})["out"], want)
    bbad = GraphBuilder("bad")
    pxb = bbad.parameter("x", (2, 5))
    plb = bbad.parameter("l", (3,), dtype=np.int32)
    with pytest.raises(ValueError, match="batch extent"):
        bbad._add_node("ReverseSequence", [pxb, plb], {})


class TestNormOneHotScatter:
    def _both(self, m, feeds, atol=1e-5):
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        ref = Interpreter(m).run(feeds)["out"]
        got = compile_model(m, Config())(feeds)["out"]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=atol)
        return ref

    def test_batch_norm_inference_vs_torch(self):
        import torch
        import torch.nn.functional as F

        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
        g = rng.uniform(0.5, 1.5, 4).astype(np.float32)
        bb = rng.standard_normal(4).astype(np.float32)
        mean = rng.standard_normal(4).astype(np.float32)
        var = rng.uniform(0.5, 2.0, 4).astype(np.float32)

        b = GraphBuilder("bn")
        p = b.parameter("x", (2, 4, 5, 5))
        b.result(b._add_node("BatchNormInference", [
            p, b.const(g), b.const(bb), b.const(mean), b.const(var)
        ], {"epsilon": "1e-5"}), "out")
        ref = self._both(b.build(), {"x": x})
        want = F.batch_norm(
            torch.from_numpy(x), torch.from_numpy(mean),
            torch.from_numpy(var), torch.from_numpy(g),
            torch.from_numpy(bb), training=False, eps=1e-5).numpy()
        np.testing.assert_allclose(ref, want, rtol=1e-4, atol=1e-5)

    def test_group_norm_vs_torch(self):
        import torch
        import torch.nn.functional as F

        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 6, 4, 4)).astype(np.float32)
        g = rng.uniform(0.5, 1.5, 6).astype(np.float32)
        bb = rng.standard_normal(6).astype(np.float32)
        b = GraphBuilder("gn")
        p = b.parameter("x", (2, 6, 4, 4))
        b.result(b._add_node("GroupNormalization", [
            p, b.const(g), b.const(bb)
        ], {"num_groups": "3", "epsilon": "1e-5"}), "out")
        ref = self._both(b.build(), {"x": x}, atol=1e-4)
        want = F.group_norm(torch.from_numpy(x), 3,
                            torch.from_numpy(g), torch.from_numpy(bb),
                            eps=1e-5).numpy()
        np.testing.assert_allclose(ref, want, rtol=1e-3, atol=1e-4)

    def test_one_hot(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("oh")
        p = b.parameter("i", (2, 3), dtype=np.int32)
        b.result(b._add_node("OneHot", [
            p, b.const(np.asarray(4, np.int64)),
            b.const(np.float32(1.0)), b.const(np.float32(0.0))
        ], {"axis": "-1"}), "out")
        m = b.build()
        idx = np.asarray([[0, 3, 1], [2, 2, 0]], np.int32)
        ref = self._both(m, {"i": idx})
        assert ref.shape == (2, 3, 4)
        np.testing.assert_allclose(ref.argmax(-1), idx)
        np.testing.assert_allclose(ref.sum(), 6)

    def test_scatter_elements_update(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        rng = np.random.default_rng(2)
        d = rng.standard_normal((3, 5)).astype(np.float32)
        idx = np.asarray([[1, 3], [0, 4], [2, 2]], np.int32)
        upd = np.full((3, 2), 9.0, np.float32)
        b = GraphBuilder("seu")
        dp = b.parameter("d", (3, 5))
        ip = b.parameter("i", (3, 2), dtype=np.int32)
        up = b.parameter("u", (3, 2))
        b.result(b._add_node("ScatterElementsUpdate", [
            dp, ip, up, b.const(np.asarray(1, np.int64))
        ], {}), "out")
        ref = self._both(b.build(), {"d": d, "i": idx, "u": upd})
        want = d.copy()
        np.put_along_axis(want, idx.astype(np.int64), upd, axis=1)
        np.testing.assert_allclose(ref, want)

    def test_reduce_logical(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        x = np.asarray([[1, 0, 1], [1, 1, 1]], np.float32)
        for op, np_fn in (("ReduceLogicalAnd", np.all),
                          ("ReduceLogicalOr", np.any)):
            b = GraphBuilder(op.lower())
            p = b.parameter("x", (2, 3), dtype=np.bool_)
            ax = b.const(np.asarray([1], np.int64))
            b.result(b._add_node(op, [p, ax], {"keep_dims": "false"},
                                 out_dtype=np.bool_), "out")
            m = b.build()
            ref = self._both(m, {"x": x.astype(bool)})
            np.testing.assert_array_equal(
                np.asarray(ref, bool), np_fn(x.astype(bool), axis=1))


def test_ctc_greedy_decoder():
    """Merge-repeats + blank-drop semantics on a hand-built sequence,
    plus interpreter/XLA parity with masked tails."""
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    T, N, C = 6, 2, 4  # class 3 is the blank
    probs = np.zeros((T, N, C), np.float32)
    # seq 0: a a blank a b b  -> merged: a a b
    for t, c in enumerate([0, 0, 3, 0, 1, 1]):
        probs[t, 0, c] = 1.0
    # seq 1 (len 4): b blank blank c -> b c
    for t, c in enumerate([1, 3, 3, 2, 0, 0]):
        probs[t, 1, c] = 1.0
    mask = np.ones((T, N), np.float32)
    mask[4:, 1] = 0.0  # seq 1 ends at t=4

    b = GraphBuilder("ctc")
    p = b.parameter("p", (T, N, C))
    mk = b.parameter("m", (T, N))
    b.result(b._add_node("CTCGreedyDecoder", [p, mk], {}), "out")
    m = b.build()
    ref = Interpreter(m).run({"p": probs, "m": mask})["out"]
    got = compile_model(m, Config())({"p": probs, "m": mask})["out"]
    np.testing.assert_allclose(got, ref)
    assert ref.shape == (N, T, 1, 1)
    np.testing.assert_allclose(ref[0, :, 0, 0], [0, 0, 1, -1, -1, -1])
    np.testing.assert_allclose(ref[1, :, 0, 0], [1, 2, -1, -1, -1, -1])

    # merge off: repeats survive
    b2 = GraphBuilder("ctc2")
    p2 = b2.parameter("p", (T, N, C))
    m2 = b2.parameter("m", (T, N))
    b2.result(b2._add_node("CTCGreedyDecoder", [p2, m2],
                           {"ctc_merge_repeated": "0"}), "out")
    ref2 = Interpreter(b2.build()).run({"p": probs, "m": mask})["out"]
    np.testing.assert_allclose(ref2[0, :, 0, 0], [0, 0, 0, 1, 1, -1])


def test_embedding_bag_offsets_sum():
    import torch

    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(9)
    table = rng.standard_normal((10, 4)).astype(np.float32)
    indices = np.asarray([0, 2, 2, 5, 9], np.int32)
    offsets = np.asarray([0, 2, 2, 4], np.int32)  # bag 1 is EMPTY

    def build(with_weights=False, with_default=False):
        b = GraphBuilder("ebs")
        t = b.parameter("t", (10, 4))
        i = b.parameter("i", (5,), dtype=np.int32)
        o = b.parameter("o", (4,), dtype=np.int32)
        ins = [t, i, o]
        if with_default or with_weights:
            ins.append(b.const(np.asarray(7, np.int32)))
        if with_weights:
            ins.append(b.parameter("w", (5,)))
        b.result(b._add_node("EmbeddingBagOffsetsSum", ins, {}), "out")
        return b.build()

    feeds = {"t": table, "i": indices, "o": offsets}
    m = build()
    ref = Interpreter(m).run(feeds)["out"]
    got = compile_model(m, Config())(feeds)["out"]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # torch oracle (empty bags give zeros without a default index)
    want = torch.nn.functional.embedding_bag(
        torch.from_numpy(indices.astype(np.int64)),
        torch.from_numpy(table),
        torch.from_numpy(offsets.astype(np.int64)), mode="sum").numpy()
    np.testing.assert_allclose(ref, want, rtol=1e-5, atol=1e-6)

    # default_index fills empty bags with that table row
    m2 = build(with_default=True)
    ref2 = Interpreter(m2).run(feeds)["out"]
    got2 = compile_model(m2, Config())(feeds)["out"]
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref2[1], table[7], rtol=1e-6)

    # per-sample weights
    w = rng.uniform(0.5, 1.5, 5).astype(np.float32)
    m3 = build(with_weights=True)
    f3 = dict(feeds, w=w)
    ref3 = Interpreter(m3).run(f3)["out"]
    got3 = compile_model(m3, Config())(f3)["out"]
    np.testing.assert_allclose(got3, ref3, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        ref3[0], w[0] * table[0] + w[1] * table[2], rtol=1e-5)


def test_broadcast_explicit_mode():
    """opset3 Broadcast mode=explicit: axes_mapping pins input dims to
    target axes (NOT numpy right-alignment) — a (16,) vector pinned to
    axis 1 of (2, 16, 3) tiles over axes 0 and 2."""
    from pyopenvino_tpu.ir.builder import GraphBuilder

    rng = np.random.default_rng(0)
    v = rng.standard_normal(16).astype(np.float32)
    b = GraphBuilder("bx")
    x = b.parameter("x", (16,))
    t = b.const(np.asarray([2, 16, 3], np.int64))
    am = b.const(np.asarray([1], np.int64))
    b.result(b._add_node("Broadcast", [x, t, am], {"mode": "explicit"}),
             "out")
    m = b.build()
    ref = Interpreter(m).run({"x": v})["out"]
    assert ref.shape == (2, 16, 3)
    np.testing.assert_array_equal(ref, np.broadcast_to(
        v.reshape(1, 16, 1), (2, 16, 3)))
    got = compile_model(m, Config(backend=Backend.XLA))({"x": v})["out"]
    np.testing.assert_array_equal(got, ref)


def test_broadcast_explicit_bad_mapping():
    from pyopenvino_tpu.ir.builder import GraphBuilder

    b = GraphBuilder("bx")
    x = b.parameter("x", (16,))
    t = b.const(np.asarray([2, 8, 3], np.int64))
    am = b.const(np.asarray([1], np.int64))
    with pytest.raises(ValueError, match="pinned to target"):
        b._add_node("Broadcast", [x, t, am], {"mode": "explicit"})


def test_broadcast_explicit_unsorted_axes_transposes():
    """axes_mapping (1, 0): the input must be PERMUTED into target order
    — a plain reshape would silently scramble rows."""
    from pyopenvino_tpu.ir.builder import GraphBuilder

    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = GraphBuilder("bx")
    p = b.parameter("x", (3, 4))
    t = b.const(np.asarray([4, 3], np.int64))
    am = b.const(np.asarray([1, 0], np.int64))
    b.result(b._add_node("Broadcast", [p, t, am], {"mode": "explicit"}),
             "out")
    m = b.build()
    ref = Interpreter(m).run({"x": x})["out"]
    np.testing.assert_array_equal(ref, x.T)
    got = compile_model(m, Config(backend=Backend.XLA))({"x": x})["out"]
    np.testing.assert_array_equal(got, ref)
