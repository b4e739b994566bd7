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
