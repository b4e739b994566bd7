"""Focused op-semantics unit tests for the reference's tricky corners
(SURVEY.md §7 hard parts 2-3 and the quirks list):

  * auto_pad explicit/valid/same_upper/same_lower × rounding floor/ceil
    (the reference has three diverging copies — Convolution.py:21-49 vs
    MaxPool.py:10-38);
  * ceil-mode pooling (GoogLeNet uses rounding_type="ceil" 14×);
  * AvgPool honouring pads with exclude-pad (the reference parses pads and
    ignores them — AvgPool.py:41-59);
  * MaxPool correctness on all-negative inputs (reference naive kernel
    inits the running max to 0 — MaxPool.py:95);
  * Reshape special dims 0 / -1 (Reshape.py:20-41);
  * StridedSlice masks without eval (StridedSlice.py:14-23,38-44);
  * SoftMax honouring its axis (SoftMax.py ignores it).

Each case checks numpy ref_compute against the JAX emit path — the same
differential contract the integrity matrix applies at model scale.
"""

import numpy as np
import pytest

from pyopenvino_tpu.ir.model import Node, TensorInfo
from pyopenvino_tpu.ops import get_op
from pyopenvino_tpu.ops.padding import resolve_padding_2d
from pyopenvino_tpu.ops.spec import TValue


class _Ctx:
    use_pallas = False
    pallas_interpret = True

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.float32

    def weight_for(self, node, tv):
        return tv.arr

    def static_value(self, node, port, inputs):
        raise AssertionError("not used in these tests")


def _node(op_type, attrs, out_shape=(1,)):
    return Node(
        id=0, name=f"t_{op_type}", op_type=op_type,
        attrs={k: str(v) for k, v in attrs.items()},
        inputs={}, outputs={0: TensorInfo(shape=out_shape, dtype=np.float32)},
    )


def _run_both(op_type, attrs, np_inputs, static=None):
    """ref_compute vs emit on the same inputs; returns (ref, jax) arrays."""
    import jax.numpy as jnp

    op = get_op(op_type)
    node = _node(op_type, attrs)
    ref = op.ref_compute(node, dict(np_inputs))
    port = next(iter(ref))
    node.outputs = {port: TensorInfo(shape=ref[port].shape, dtype=ref[port].dtype)}

    class Ctx(_Ctx):
        def static_value(self, n, p, inputs):
            return static[p]

    tvs = {p: TValue(jnp.asarray(v), "L") for p, v in np_inputs.items()
           if static is None or p not in static}
    out = op.emit(Ctx(), node, tvs)
    got = out[port].nchw() if len(ref[port].shape) == 4 else out[port].arr
    return ref[port], np.asarray(got)


# ---------------------------------------------------------------------------


class TestPaddingResolution:
    def test_same_upper_puts_extra_at_end(self):
        p = resolve_padding_2d((5, 5), (3, 3), (2, 2), (1, 1),
                               (0, 0), (0, 0), "same_upper")
        assert (p.out_h, p.out_w) == (3, 3)
        assert p.pad_top <= p.pad_bottom and p.pad_left <= p.pad_right

    def test_same_lower_puts_extra_at_begin(self):
        p = resolve_padding_2d((5, 5), (3, 3), (2, 2), (1, 1),
                               (0, 0), (0, 0), "same_lower")
        assert p.pad_top >= p.pad_bottom

    def test_valid_ignores_declared_pads(self):
        p = resolve_padding_2d((7, 7), (3, 3), (1, 1), (1, 1),
                               (2, 2), (2, 2), "valid")
        assert (p.out_h, p.pad_top, p.pad_bottom) == (5, 0, 0)

    def test_ceil_rounding_adds_end_padding(self):
        # 8 input, k=3, s=2, no pads: floor → 3, ceil → 4 (needs 1 extra)
        pf = resolve_padding_2d((8, 8), (3, 3), (2, 2), (1, 1),
                                (0, 0), (0, 0), "explicit", "floor")
        pc = resolve_padding_2d((8, 8), (3, 3), (2, 2), (1, 1),
                                (0, 0), (0, 0), "explicit", "ceil")
        assert pf.out_h == 3 and pc.out_h == 4
        assert pc.pad_bottom >= 1

    def test_dilation_effective_kernel(self):
        p = resolve_padding_2d((9, 9), (3, 3), (1, 1), (2, 2),
                               (0, 0), (0, 0), "explicit")
        assert p.out_h == 5  # eff_k = 5


class TestPooling:
    def test_maxpool_all_negative(self):
        # reference naive kernel would return 0 here (MaxPool.py:95)
        x = -np.abs(np.random.default_rng(0).standard_normal((1, 2, 6, 6))) - 1
        ref, got = _run_both(
            "MaxPool",
            {"kernel": "2,2", "strides": "2,2", "pads_begin": "0,0",
             "pads_end": "0,0", "rounding_type": "floor"},
            {0: x.astype(np.float32)},
        )
        assert ref.max() < 0
        np.testing.assert_allclose(ref, got, rtol=1e-6)

    def test_maxpool_ceil_mode(self):
        x = np.random.default_rng(1).standard_normal((1, 3, 8, 8)).astype(np.float32)
        ref, got = _run_both(
            "MaxPool",
            {"kernel": "3,3", "strides": "2,2", "pads_begin": "0,0",
             "pads_end": "0,0", "rounding_type": "ceil"},
            {0: x},
        )
        assert ref.shape == (1, 3, 4, 4)
        np.testing.assert_allclose(ref, got, rtol=1e-6)

    def test_avgpool_exclude_pad_honours_pads(self):
        # padded window averages over in-bounds elements only
        x = np.ones((1, 1, 4, 4), np.float32)
        ref, got = _run_both(
            "AvgPool",
            {"kernel": "3,3", "strides": "2,2", "pads_begin": "1,1",
             "pads_end": "1,1", "exclude-pad": "true",
             "rounding_type": "floor"},
            {0: x},
        )
        # all-ones input: exclude-pad average is exactly 1 everywhere
        np.testing.assert_allclose(ref, np.ones_like(ref), rtol=1e-6)
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_avgpool_include_pad(self):
        x = np.ones((1, 1, 4, 4), np.float32)
        ref, got = _run_both(
            "AvgPool",
            {"kernel": "3,3", "strides": "2,2", "pads_begin": "1,1",
             "pads_end": "1,1", "exclude-pad": "false",
             "rounding_type": "floor"},
            {0: x},
        )
        # corner window sees 4 real ones out of 9 slots
        assert abs(ref[0, 0, 0, 0] - 4.0 / 9.0) < 1e-6
        np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestConvSemantics:
    @pytest.mark.parametrize("auto_pad", ["explicit", "valid", "same_upper",
                                          "same_lower"])
    def test_conv_auto_pads(self, auto_pad):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 3, 9, 9)).astype(np.float32)
        w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
        attrs = {"strides": "2,2", "dilations": "1,1",
                 "pads_begin": "1,1", "pads_end": "1,1",
                 "auto_pad": auto_pad}
        ref, got = _run_both("Convolution", attrs, {0: x, 1: w})
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)

    def test_conv_dilation_fast_path(self):
        # the reference's im2col ignores dilation (Convolution.py:87)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 2, 12, 12)).astype(np.float32)
        w = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)
        attrs = {"strides": "1,1", "dilations": "2,2",
                 "pads_begin": "0,0", "pads_end": "0,0",
                 "auto_pad": "explicit"}
        ref, got = _run_both("Convolution", attrs, {0: x, 1: w})
        assert ref.shape == (1, 3, 8, 8)
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)

    def test_group_conv_general_groups(self):
        # reference indexing is only correct for depthwise
        # (GroupConvolution.py:77-78); this is G=2, Ci=Co=2 — general
        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
        w = rng.standard_normal((2, 2, 2, 3, 3)).astype(np.float32)
        attrs = {"strides": "1,1", "dilations": "1,1",
                 "pads_begin": "1,1", "pads_end": "1,1",
                 "auto_pad": "explicit"}
        ref, got = _run_both("GroupConvolution", attrs, {0: x, 1: w})
        assert ref.shape == (1, 4, 6, 6)
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)


class TestShapeOps:
    def test_reshape_special_zero_and_minus_one(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
        target = np.array([0, 0, -1], np.int64)  # → (2, 3, 20)
        op = get_op("Reshape")
        node = _node("Reshape", {"special_zero": "true"})
        ref = op.ref_compute(node, {0: x, 1: target})
        assert ref[next(iter(ref))].shape == (2, 3, 20)

    def test_softmax_axis(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 5, 3)).astype(np.float32) * 50
        for axis in (0, 1, 2):
            op = get_op("SoftMax")
            node = _node("SoftMax", {"axis": axis})
            ref = op.ref_compute(node, {0: x})
            arr = ref[next(iter(ref))]
            np.testing.assert_allclose(
                arr.sum(axis=axis), np.ones_like(arr.sum(axis=axis)),
                rtol=1e-5,
            )

    def test_softmax_large_values_stable(self):
        # reference has no max-subtraction (overflow risk, SoftMax.py:10-25)
        x = np.array([[10000.0, 10001.0, 9999.0]], np.float32)
        op = get_op("SoftMax")
        node = _node("SoftMax", {"axis": 1})
        out = op.ref_compute(node, {0: x})
        ref = out[next(iter(out))]
        assert np.all(np.isfinite(ref))


class TestStridedSliceMasks:
    """StridedSlice opset1 masks — the reference parses and ignores them
    (StridedSlice.py:38-44); here they are honoured."""

    def _run(self, attrs, x, begin, end, strides=None):
        op = get_op("StridedSlice")
        node = _node("StridedSlice", attrs)
        ins = {0: x, 1: np.asarray(begin, np.int64),
               2: np.asarray(end, np.int64)}
        if strides is not None:
            ins[3] = np.asarray(strides, np.int64)
        out = op.ref_compute(node, ins)
        return out[next(iter(out))]

    def test_begin_end_masks(self):
        x = np.arange(24).reshape(2, 3, 4)
        got = self._run(
            {"begin_mask": "1,0,0", "end_mask": "0,1,0",
             "new_axis_mask": "0,0,0", "shrink_axis_mask": "0,0,0",
             "ellipsis_mask": "0,0,0"},
            x, [1, 1, 1], [2, 2, 3],
        )
        np.testing.assert_array_equal(got, x[:, 1:, 1:3])

    def test_shrink_axis(self):
        x = np.arange(24).reshape(2, 3, 4)
        got = self._run(
            {"begin_mask": "0,0,0", "end_mask": "0,0,0",
             "new_axis_mask": "0,0,0", "shrink_axis_mask": "0,1,0",
             "ellipsis_mask": "0,0,0"},
            x, [0, 2, 0], [2, 0, 4],
        )
        np.testing.assert_array_equal(got, x[:, 2, :])

    def test_new_axis(self):
        x = np.arange(12).reshape(3, 4)
        got = self._run(
            {"begin_mask": "0,1,1", "end_mask": "0,1,1",
             "new_axis_mask": "1,0,0", "shrink_axis_mask": "0,0,0",
             "ellipsis_mask": "0,0,0"},
            x, [0, 0, 0], [0, 3, 4],
        )
        np.testing.assert_array_equal(got, x[None, :, :])

    def test_negative_strides(self):
        x = np.arange(10)
        got = self._run(
            {"begin_mask": "1", "end_mask": "1",
             "new_axis_mask": "0", "shrink_axis_mask": "0",
             "ellipsis_mask": "0"},
            x, [0], [0], [-2],
        )
        np.testing.assert_array_equal(got, x[::-2])

    def test_ellipsis_supported(self):
        """ellipsis_mask is now implemented (numpy Ellipsis semantics —
        test_strided_slice_ellipsis_mask covers the full behavior); this
        pins that a single bit no longer refuses."""
        x = np.arange(8).reshape(2, 4).astype(np.float32)
        out = self._run(
            {"begin_mask": "0,0", "end_mask": "0,0",
             "new_axis_mask": "0,0", "shrink_axis_mask": "0,0",
             "ellipsis_mask": "1,0"},
            x, [0, 1], [2, 3],
        )
        np.testing.assert_allclose(out, x[..., 1:3])


class TestLRNBanded:
    """The TPU LRN formulation (banded C-by-C matmul window sum,
    ops/elementwise.py _lrn_banded) against the numpy reference — the
    chip route is CI-tested here directly since CPU runs keep the
    reduce_window lowering."""

    def _ref(self, x, alpha, beta, bias, size):
        c = x.shape[-1]
        sq = x.astype(np.float64) ** 2
        denom = np.empty_like(sq)
        for ch in range(c):
            lo, hi = max(0, ch - size // 2), min(c, ch + size // 2 + 1)
            denom[..., ch] = (bias + alpha * sq[..., lo:hi].sum(axis=-1)) ** beta
        return x / denom

    @pytest.mark.parametrize("c", [64, 192])
    def test_float_matches_reference(self, c):
        import jax.numpy as jnp

        from pyopenvino_tpu.ops.elementwise import _lrn_banded

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5, 7, c)).astype(np.float32)
        got = np.asarray(_lrn_banded(
            jnp.asarray(x), alpha=1e-4, beta=0.75, bias=1.0, half=2,
            in_scale=None, out_scale=None, compute_dtype=jnp.float32,
        ))
        ref = self._ref(x, 1e-4, 0.75, 1.0, 5)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    def test_general_beta_exp_log_path(self):
        import jax.numpy as jnp

        from pyopenvino_tpu.ops.elementwise import _lrn_banded

        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 3, 3, 64)).astype(np.float32)
        got = np.asarray(_lrn_banded(
            jnp.asarray(x), alpha=2e-4, beta=0.6, bias=2.0, half=1,
            in_scale=None, out_scale=None, compute_dtype=jnp.float32,
        ))
        ref = self._ref(x, 2e-4, 0.6, 2.0, 3)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    def test_int8_in_out(self):
        import jax.numpy as jnp

        from pyopenvino_tpu.ops.elementwise import _lrn_banded

        rng = np.random.default_rng(1)
        xq = rng.integers(-127, 128, (1, 4, 4, 64)).astype(np.int8)
        s_in, s_out = 0.21, 0.02
        got = np.asarray(_lrn_banded(
            jnp.asarray(xq), alpha=1e-4, beta=0.75, bias=1.0, half=2,
            in_scale=s_in, out_scale=s_out, compute_dtype=jnp.float32,
        ))
        assert got.dtype == np.int8
        ref = self._ref(xq.astype(np.float32) * s_in, 1e-4, 0.75, 1.0, 5)
        refq = np.clip(np.round(ref / s_out), -127, 127)
        np.testing.assert_allclose(
            got.astype(np.int32), refq.astype(np.int32), atol=1
        )


class TestSpaceToDepthConv:
    """Stride-2 thin-input convs rewrite onto a 2x2 space-to-depth input
    (ops/conv.py _s2d_conv) — must be bit-equivalent to the direct conv."""

    def _run(self, H, W, kh, kw, ci=3, co=8, applicable=True):
        import jax.numpy as jnp

        from pyopenvino_tpu.ops.conv import (
            _s2d_applicable, _s2d_conv,
        )
        from pyopenvino_tpu.ops.padding import conv_padding

        rng = np.random.default_rng(kh * 100 + kw)
        x = rng.standard_normal((2, H, W, ci)).astype(np.float32)
        w = rng.standard_normal((co, ci, kh, kw)).astype(np.float32)
        attrs = {
            "strides": "2,2", "dilations": "1,1",
            "pads_begin": f"{kh//2},{kw//2}", "pads_end": f"{kh//2},{kw//2}",
        }
        pad = conv_padding(attrs, (H, W), (kh, kw))
        from jax import lax

        direct = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
            window_strides=(2, 2), padding=pad.pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        assert applicable == _s2d_applicable(
            ci, kh, kw, (2, 2), (1, 1), (H, W), pad.pads,
            (pad.out_h, pad.out_w),
        )
        x2, w2 = _s2d_conv(jnp.asarray(x), jnp.asarray(w), pad.pads)
        got = lax.conv_general_dilated(
            x2, jnp.transpose(w2, (2, 3, 1, 0)),
            window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        assert got.shape == direct.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(direct), rtol=1e-5, atol=1e-5
        )

    def test_7x7_even_input(self):
        self._run(224, 224, 7, 7)       # GoogLeNet stem: odd padded dim

    def test_3x3_ssd_stem_gated_off(self):
        # math still holds at 3x3, but the routing gate refuses it: the
        # 2-padded kernel costs 1.78x the MACs — measured 5% slower on
        # SSD-MobileNet's stem (b256 14.0k vs 14.7k img/s)
        self._run(300, 300, 3, 3, applicable=False)

    def test_5x5(self):
        self._run(64, 96, 5, 5)

    def test_even_kernel_oddpad_falls_back(self):
        from pyopenvino_tpu.ops.conv import _s2d_applicable

        # padded H odd with even kernel would grow the output: must refuse
        assert not _s2d_applicable(
            3, 4, 4, (2, 2), (1, 1), (225, 224), ((0, 0), (0, 0)),
            ((225 - 4) // 2 + 1, (224 - 4) // 2 + 1),
        )


def test_strided_slice_ellipsis_mask():
    """ellipsis_mask (previously a fail-fast refusal): the single
    ellipsis bit absorbs the skipped middle axes with numpy semantics,
    composing with begin/end/shrink masks."""
    import numpy as np

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)

    b = GraphBuilder("ss")
    p = b.parameter("x", (2, 3, 4, 5))
    node = b._add_node("StridedSlice", [
        p,
        b.const(np.asarray([0, 0, 1], np.int64)),   # begin
        b.const(np.asarray([1, 0, 4], np.int64)),   # end
        b.const(np.asarray([1, 1, 1], np.int64)),   # strides
    ], {
        "begin_mask": "0,0,0", "end_mask": "0,0,0",
        "new_axis_mask": "0,0,0", "shrink_axis_mask": "1,0,0",
        "ellipsis_mask": "0,1,0",
    })
    b.result(node, "out")
    m = b.build()
    want = x[0, ..., 1:4]
    ref = Interpreter(m).run({"x": x})["out"]
    got = compile_model(m, Config())({"x": x})["out"]
    np.testing.assert_allclose(ref, want)
    np.testing.assert_allclose(got, want)
    assert ref.shape == (3, 4, 3)

    bb = GraphBuilder("bad")
    pb = bb.parameter("x", (2, 3, 4))
    with pytest.raises(ValueError, match="one ellipsis"):
        bb._add_node("StridedSlice", [
            pb, bb.const(np.zeros(3, np.int64)),
            bb.const(np.ones(3, np.int64)),
            bb.const(np.ones(3, np.int64)),
        ], {"ellipsis_mask": "1,1,0"})
