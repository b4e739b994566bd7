"""Unit tests for the SSD head ops: PriorBoxClustered values and
DetectionOutput numpy-vs-JAX parity on synthetic detections
(reference semantics: op_plugins/DetectionOutput.py:162-260,
PriorBoxClustered.py:10-40)."""

import numpy as np
import pytest

from pyopenvino_tpu.ops.ssd import (
    _iou_matrix,
    detection_output_jax,
    detection_output_ref,
    prior_boxes_clustered,
)


def test_prior_boxes_basic():
    out = prior_boxes_clustered(
        grid_hw=(2, 2),
        image_hw=(100, 100),
        widths=(10.0,),
        heights=(20.0,),
        step=0.0,
        step_h=0.0,
        step_w=0.0,
        offset=0.5,
        variance=(0.1, 0.1, 0.2, 0.2),
        img_h=0.0,
        img_w=0.0,
    )
    assert out.shape == (2, 16)
    boxes = out[0].reshape(4, 4)
    # first cell center = (0.5*50, 0.5*50) = (25, 25); box 10x20 normalized
    np.testing.assert_allclose(boxes[0], [0.20, 0.15, 0.30, 0.35], atol=1e-6)
    # variances tile per prior
    np.testing.assert_allclose(out[1].reshape(4, 4)[2], [0.1, 0.1, 0.2, 0.2])


def test_iou():
    b = np.array(
        [[0.0, 0.0, 1.0, 1.0], [0.5, 0.5, 1.5, 1.5], [2.0, 2.0, 3.0, 3.0]]
    )
    m = _iou_matrix(np, b)
    np.testing.assert_allclose(np.diag(m), 1.0)
    np.testing.assert_allclose(m[0, 1], 0.25 / 1.75, atol=1e-6)
    assert m[0, 2] == 0.0


def _make_case(seed, P=64, nc=5):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 0.5, size=(1, P * 4)).astype(np.float32)
    scores = rng.uniform(0, 1, size=(1, P * nc)).astype(np.float32)
    # anchors: random small boxes in [0,1]
    cx, cy = rng.uniform(0.2, 0.8, (2, P))
    w, h = rng.uniform(0.05, 0.3, (2, P))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    var = np.tile([0.1, 0.1, 0.2, 0.2], (P, 1))
    proposals = np.stack([boxes.reshape(-1), var.reshape(-1)])[None].astype(
        np.float32
    )
    params = dict(
        num_classes=nc,
        background_label_id=0,
        top_k=20,
        variance_encoded_in_target=False,
        keep_top_k=(20,),
        code_type="caffe.PriorBoxParameter.CENTER_SIZE",
        share_location=True,
        nms_threshold=0.5,
        confidence_threshold=0.4,
        clip_after_nms=True,
        clip_before_nms=False,
        decrease_label_id=False,
        normalized=True,
        input_height=1,
        input_width=1,
    )
    return logits, scores, proposals, params


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_detection_ref_vs_jax(seed):
    logits, scores, proposals, params = _make_case(seed)
    ref = detection_output_ref(logits, scores, proposals, params)
    got = np.asarray(detection_output_jax(logits, scores, proposals, params))
    assert ref.shape == got.shape == (1, 1, 20, 7)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_detection_terminator_row():
    logits, scores, proposals, params = _make_case(0)
    params = dict(params, confidence_threshold=2.0)  # nothing passes
    ref = detection_output_ref(logits, scores, proposals, params)
    got = np.asarray(detection_output_jax(logits, scores, proposals, params))
    # first record is the -1 terminator (reference: DetectionOutput.py:256-258)
    assert ref[0, 0, 0, 0] == -1.0
    np.testing.assert_allclose(got, ref)


def test_detection_corner_code_type():
    logits, scores, proposals, params = _make_case(5)
    params = dict(params, code_type="caffe.PriorBoxParameter.CORNER")
    ref = detection_output_ref(logits, scores, proposals, params)
    got = np.asarray(detection_output_jax(logits, scores, proposals, params))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_detection_batched_matches_per_example(seed):
    """The tiled batched formulation (detection_output_jax_batched, the
    compiler's vmap rule) must reproduce the per-example result exactly."""
    from pyopenvino_tpu.ops.ssd import detection_output_jax_batched

    B = 5
    cases = [_make_case(seed * 10 + i) for i in range(B)]
    params = cases[0][3]
    logits = np.stack([c[0] for c in cases])       # (B, 1, P*4)
    scores = np.stack([c[1] for c in cases])
    proposals = np.stack([c[2] for c in cases])    # (B, 1, 2, P*pbs)

    got = np.asarray(
        detection_output_jax_batched(logits, scores, proposals, params)
    )
    for i, (lg, sc, pr, _) in enumerate(cases):
        ref = detection_output_ref(lg, sc, pr, params)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"example {i}")


def test_detection_batched_under_compiler_vmap():
    """End-to-end: infer_batch on the SSD model routes DetectionOutput
    through the batched custom_vmap rule and matches per-example infer."""
    from pyopenvino_tpu.config import Backend, Config
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    xml, binp = model_paths("ssd_mobilenet_v1_coco")
    c = compile_model(read_ir_model(xml, binp), Config(backend=Backend.XLA))
    rng = np.random.default_rng(11)
    B = 3
    blobs = rng.uniform(0, 255, (B, 1, 3, 300, 300)).astype(np.float32)
    batched = c.infer_batch({"image_tensor": blobs})
    for i in range(B):
        single = c({"image_tensor": blobs[i]})
        for k in single:
            np.testing.assert_allclose(
                batched[k][i][None], single[k], rtol=1e-3, atol=1e-4,
                err_msg=f"example {i}")


def test_detection_batched_fewer_priors_than_records():
    """P < keep_top_k exercises the top-k pad branch (terminator can land
    beyond the top-k block)."""
    from pyopenvino_tpu.ops.ssd import detection_output_jax_batched

    B = 3
    cases = [_make_case(100 + i, P=12) for i in range(B)]
    params = dict(cases[0][3], keep_top_k=(20,), top_k=20)
    logits = np.stack([c[0] for c in cases])
    scores = np.stack([c[1] for c in cases])
    proposals = np.stack([c[2] for c in cases])
    got = np.asarray(
        detection_output_jax_batched(logits, scores, proposals, params)
    )
    for i, (lg, sc, pr, _) in enumerate(cases):
        ref = detection_output_ref(lg, sc, pr, params)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"example {i}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 11])
def test_top_k_prefilter_records_are_prefix_of_full_nms(seed):
    """Spec top_k pre-NMS (ops/ssd.py _top_k_prefilter_np) exactness: every
    record the prefiltered form emits must equal the same-rank record of
    full NMS — a killer always outranks its victim, so the kept top-k boxes
    are exactly the top-ranked kept boxes of the unfiltered suppression.
    Only trailing sub-top-k records (beyond the prefix) may differ."""
    logits, scores, proposals, params = _make_case(seed, P=96)
    full = detection_output_ref(
        logits, scores, proposals, dict(params, top_k=-1)
    )[0, 0]
    pre = detection_output_ref(
        logits, scores, proposals, dict(params, top_k=8)
    )[0, 0]
    n_pre = next(
        (i for i in range(pre.shape[0]) if pre[i, 0] == -1.0), pre.shape[0]
    )
    assert n_pre <= 8
    np.testing.assert_allclose(pre[:n_pre], full[:n_pre], rtol=1e-6)
    # and the jax twins implement the same prefilter
    got = np.asarray(detection_output_jax(
        logits, scores, proposals, dict(params, top_k=8)
    ))[0, 0]
    np.testing.assert_allclose(got[:n_pre], pre[:n_pre], rtol=1e-4, atol=1e-5)


def test_batched_output_shape_uses_full_prior_count():
    """Regression: with keep_top_k<=0 the record count derives from the
    FULL prior count; the batched twin must not compute it from the
    compacted top_k candidate count (found by self-review of the top_k
    compaction)."""
    from pyopenvino_tpu.ops.ssd import detection_output_jax_batched

    P, nc, B = 32, 3, 2
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 0.5, (B, P * 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (B, P * nc)).astype(np.float32)
    cx, cy = rng.uniform(0.2, 0.8, (2, P))
    w, h = rng.uniform(0.05, 0.3, (2, P))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    var = np.tile([0.1, 0.1, 0.2, 0.2], (P, 1))
    proposals = np.broadcast_to(
        np.stack([boxes.reshape(-1), var.reshape(-1)])[None],
        (B, 2, P * 4),
    ).astype(np.float32)
    params = dict(
        num_classes=nc, background_label_id=0, top_k=8,
        variance_encoded_in_target=False, keep_top_k=(0,),
        code_type="caffe.PriorBoxParameter.CENTER_SIZE",
        share_location=True, nms_threshold=0.5, confidence_threshold=0.4,
        clip_after_nms=True, clip_before_nms=False, decrease_label_id=False,
        normalized=True, input_height=1, input_width=1,
    )
    out = np.asarray(detection_output_jax_batched(
        logits, scores, proposals, params
    ))
    assert out.shape == (B, 1, 1, nc * P, 7)
    ref = detection_output_ref(logits[:1], scores[:1], proposals[0][None],
                               params)
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", range(8))
def test_batched_matches_ref_with_inverting_boxes(seed):
    """Regression (review finding): with CORNER decode and large logit
    variance, decoded boxes can half-invert (negative area).  The batched
    tiled suppression's div-free overlap test (inter > thr*union) then
    spuriously killed valid boxes where the ref's inter/union gives
    -0.0/NaN (no overlap) — the union>0 guard keeps the twins exact."""
    P, nc = 40, 5
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 0.5, (1, P * 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (1, P * nc)).astype(np.float32)
    cx, cy = rng.uniform(0.2, 0.8, (2, P))
    w, h = rng.uniform(0.05, 0.3, (2, P))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    var = np.tile([0.5, 0.5, 0.5, 0.5], (P, 1))  # large: inverts some boxes
    proposals = np.stack([boxes.reshape(-1), var.reshape(-1)])[None].astype(
        np.float32)
    params = dict(
        num_classes=nc, background_label_id=0, top_k=-1,
        variance_encoded_in_target=False, keep_top_k=(20,),
        code_type="caffe.PriorBoxParameter.CORNER",
        share_location=True, nms_threshold=0.4, confidence_threshold=0.4,
        clip_after_nms=False, clip_before_nms=False, decrease_label_id=False,
        normalized=True, input_height=1, input_width=1,
    )
    from pyopenvino_tpu.ops.ssd import detection_output_jax_batched

    ref = detection_output_ref(logits, scores, proposals, params)
    # already batch-shaped: logits (1, P*4), scores (1, P*nc),
    # proposals (1, 2, P*4)
    got = np.asarray(detection_output_jax_batched(
        logits, scores, proposals, params,
    ))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                               err_msg=f"seed={seed}")


class TestPriorBox:
    """opset1 PriorBox (classic SSD300-VGG anchors) — ops/ssd.py
    prior_boxes; the reference only has the clustered sibling."""

    def _model(self, **kw):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("pb")
        x = b.parameter("x", (1, 1, 2, 2))  # anchor for graph liveness
        pri = b.prior_box((2, 2), (8, 8), **kw)
        b.result(b.add(pri, b.const(np.zeros((1, 1), np.float32))), "out")
        b.result(b.reshape(x, (1, 4)), "unused")
        return b.build()

    def test_box_order_and_values(self):
        from pyopenvino_tpu.ops.ssd import prior_boxes

        p = dict(min_size=(4.0,), max_size=(9.0,), aspect_ratio=(2.0,),
                 flip=True, clip=False, step=4.0, offset=0.5,
                 variance=(0.1, 0.1, 0.2, 0.2), scale_all_sizes=True)
        out = prior_boxes((2, 2), (8, 8), p)
        P = out.shape[1] // 4
        boxes = out[0].reshape(2, 2, P // 4, 4)
        # spec order: min square, sqrt(min*max) square, ar=2, ar=1/2
        assert P // 4 == 4
        cx = cy = (0 + 0.5) * 4.0  # first cell center, px
        m, s = 4.0, np.sqrt(4.0 * 9.0)
        r = np.sqrt(2.0)
        want = [
            (m, m), (s, s), (m * r, m / r), (m / r, m * r),
        ]
        for k, (w, h) in enumerate(want):
            np.testing.assert_allclose(
                boxes[0, 0, k],
                [(cx - w / 2) / 8, (cy - h / 2) / 8,
                 (cx + w / 2) / 8, (cy + h / 2) / 8], rtol=1e-6)
        # variances tiled per box
        np.testing.assert_allclose(
            out[1][:8], [0.1, 0.1, 0.2, 0.2] * 2, rtol=1e-6)

    def test_single_variance_and_clip(self):
        from pyopenvino_tpu.ops.ssd import prior_boxes

        p = dict(min_size=(16.0,), max_size=(), aspect_ratio=(),
                 flip=False, clip=True, step=0.0, offset=0.5,
                 variance=(0.1,), scale_all_sizes=True)
        out = prior_boxes((2, 2), (8, 8), p)
        assert out.shape == (2, 4 * 2 * 2 * 1)
        assert out[0].min() >= 0.0 and out[0].max() <= 1.0  # clipped
        np.testing.assert_allclose(out[1], 0.1)

    def test_interpreter_vs_compiled_fold(self):
        from pyopenvino_tpu.config import Config
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        m = self._model(min_size=(4.0,), max_size=(9.0,),
                        aspect_ratio=(2.0, 3.0), flip=True)
        blob = np.zeros((1, 1, 2, 2), np.float32)
        ref = Interpreter(m).run({"x": blob})["out"]
        got = compile_model(m, Config())({"x": blob})["out"]
        np.testing.assert_allclose(got, ref, rtol=1e-6)
        assert ref.shape[1] == 4 * 2 * 2 * 6  # 1 + 1 + 4 ar boxes


class TestROIAlign:
    """opset3 ROIAlign (ops/roi.py) — no analogue in the reference."""

    def _model(self, n, c, h, w, r, **kw):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("roi")
        data = b.parameter("data", (n, c, h, w))
        rois = b.parameter("rois", (r, 4))
        idx = b.parameter("idx", (r,), dtype=np.int32)
        b.result(b.roi_align(data, rois, idx, **kw), "out")
        return b.build()

    def test_constant_region_average(self):
        """A constant image pools to that constant regardless of the roi
        geometry — pins the bilinear/bin plumbing."""
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        m = self._model(1, 2, 8, 8, 2, pooled_h=3, pooled_w=3,
                        sampling_ratio=2)
        data = np.full((1, 2, 8, 8), 5.0, np.float32)
        rois = np.asarray([[0, 0, 7, 7], [1.5, 2.0, 6.0, 5.5]], np.float32)
        idx = np.zeros(2, np.int32)
        out = Interpreter(m).run(
            {"data": data, "rois": rois, "idx": idx})["out"]
        assert out.shape == (2, 2, 3, 3)
        np.testing.assert_allclose(out, 5.0, rtol=1e-6)

    def test_linear_ramp_exact(self):
        """On a linear ramp image, bilinear sampling is EXACT, so each
        bin's average equals the ramp at the bin's sample centroid."""
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        h = w = 8
        m = self._model(1, 1, h, w, 1, pooled_h=2, pooled_w=2,
                        sampling_ratio=2)
        data = np.broadcast_to(
            np.arange(w, dtype=np.float32), (1, 1, h, w)).copy()  # ramp in x
        rois = np.asarray([[1.0, 1.0, 5.0, 5.0]], np.float32)
        out = Interpreter(m).run({
            "data": data, "rois": rois, "idx": np.zeros(1, np.int32)
        })["out"]
        # bin width 2; sample xs at 1+{0.5,1.5} and 1+{2.5,3.5}
        np.testing.assert_allclose(out[0, 0, 0], [2.0, 4.0], rtol=1e-6)

    def test_interpreter_vs_compiled_and_modes(self):
        from pyopenvino_tpu.config import Backend, Config
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        rng = np.random.default_rng(0)
        data = rng.standard_normal((2, 3, 10, 12)).astype(np.float32)
        rois = np.asarray(
            [[0, 0, 11, 9], [2.3, 1.1, 8.7, 7.5], [5, 5, 9, 9]], np.float32)
        idx = np.asarray([0, 1, 0], np.int32)
        for mode in ("avg", "max"):
            m = self._model(2, 3, 10, 12, 3, pooled_h=4, pooled_w=5,
                            sampling_ratio=3, spatial_scale=0.5, mode=mode)
            feeds = {"data": data, "rois": rois, "idx": idx}
            ref = Interpreter(m).run(feeds)["out"]
            for backend in (Backend.XLA, Backend.PALLAS):
                got = compile_model(m, Config(backend=backend))(feeds)["out"]
                np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_adaptive_sampling_refused(self):
        with pytest.raises(NotImplementedError, match="sampling_ratio"):
            self._model(1, 1, 4, 4, 1, pooled_h=2, pooled_w=2,
                        sampling_ratio=0)


class TestPriorBoxSpecCorners:
    """Spec corners surfaced by review: scale_all_sizes=False layout,
    fixed 0.5 offset at step==0, variance arity validation."""

    def test_scale_all_sizes_false_mxnet_layout(self):
        from pyopenvino_tpu.ops.ssd import _pb_wh_list, prior_boxes

        p = dict(min_size=(4.0, 8.0), max_size=(9.0,),
                 aspect_ratio=(2.0,), flip=True, clip=False, step=4.0,
                 offset=0.5, variance=(0.1,), scale_all_sizes=False)
        wh = _pb_wh_list(p)
        # one square per min_size + ar boxes for min_size[0]; NO max box
        r = np.sqrt(2.0)
        np.testing.assert_allclose(
            wh, [(4, 4), (8, 8), (4 * r, 4 / r), (4 / r, 4 * r)],
            rtol=1e-6)
        out = prior_boxes((1, 1), (8, 8), p)
        assert out.shape[1] == 4 * len(wh)

    def test_step_zero_uses_fixed_half_offset(self):
        from pyopenvino_tpu.ops.ssd import prior_boxes

        base = dict(min_size=(4.0,), max_size=(), aspect_ratio=(),
                    flip=False, clip=False, variance=(0.1,),
                    scale_all_sizes=True)
        a = prior_boxes((2, 2), (8, 8), dict(base, step=0.0, offset=0.9))
        b = prior_boxes((2, 2), (8, 8), dict(base, step=0.0, offset=0.5))
        np.testing.assert_allclose(a, b)  # offset ignored at step==0
        c = prior_boxes((2, 2), (8, 8), dict(base, step=4.0, offset=0.9))
        assert np.abs(a[0] - c[0]).max() > 1e-3  # but honoured with step

    def test_variance_arity_validated(self):
        from pyopenvino_tpu.ops.ssd import prior_boxes

        p = dict(min_size=(4.0,), max_size=(), aspect_ratio=(),
                 flip=False, clip=False, step=4.0, offset=0.5,
                 variance=(0.1, 0.1, 0.2), scale_all_sizes=True)
        with pytest.raises(ValueError, match="1 or 4"):
            prior_boxes((2, 2), (8, 8), p)


def test_roi_align_out_of_range_samples_zero():
    """Caffe2/OpenVINO convention: samples beyond [-1, size] contribute
    ZERO (not the clamped border value) — an edge roi on a constant-1
    image pools to < 1."""
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    m = TestROIAlign()._model(1, 1, 4, 4, 2, pooled_h=1, pooled_w=1,
                              sampling_ratio=2)
    data = np.ones((1, 1, 4, 4), np.float32)
    rois = np.asarray([[0, 0, 3, 3],      # fully inside → 1.0
                       [2, 2, 12, 12]],   # mostly outside → < 1
                      np.float32)
    idx = np.zeros(2, np.int32)
    feeds = {"data": data, "rois": rois, "idx": idx}
    ref = Interpreter(m).run(feeds)["out"]
    got = compile_model(m, Config())(feeds)["out"]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    assert abs(float(ref[0]) - 1.0) < 1e-6
    assert float(ref[1]) < 0.99  # out-of-range samples zeroed the average


class TestProposal:
    """opset4 Proposal (ops/proposal.py) — the RPN stage completing the
    two-stage set (Proposal → ROIAlign)."""

    def _model(self, n, a, h, w, **kw):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("rpn")
        probs = b.parameter("probs", (n, 2 * a, h, w))
        deltas = b.parameter("deltas", (n, 4 * a, h, w))
        info = b.const(np.asarray([32.0, 32.0, 1.0], np.float32), "im")
        rois, sc = b.proposal(probs, deltas, info, **kw)
        b.result(rois, "rois")
        b.result(sc, "scores")
        return b.build()

    def test_interpreter_vs_compiled(self):
        from pyopenvino_tpu.config import Config
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        rng = np.random.default_rng(0)
        n, a, h, w = 2, 2, 4, 4  # A = len(ratio)*len(scale) = 2
        m = self._model(n, a, h, w, base_size=8, feat_stride=8,
                        ratio=(0.5, 1.0), scale=(1.0,),
                        pre_nms_topn=20, post_nms_topn=6,
                        nms_thresh=0.5, min_size=2)
        feeds = {
            "probs": rng.uniform(0, 1, (n, 2 * a, h, w)).astype(np.float32),
            "deltas": rng.normal(0, 0.2, (n, 4 * a, h, w)).astype(
                np.float32),
        }
        ref = Interpreter(m).run(feeds)
        got = compile_model(m, Config())(feeds)
        assert ref["rois"].shape == (n * 6, 5)
        np.testing.assert_allclose(got["rois"], ref["rois"], rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(got["scores"], ref["scores"],
                                   rtol=1e-4, atol=1e-5)
        # structural invariants: batch column, clipped boxes, score order
        rois = ref["rois"]
        live = ref["scores"] > 0
        assert live.any()
        assert set(np.unique(rois[live, 0])) <= {0.0, 1.0}
        assert rois[live, 1:].min() >= 0 and rois[live, 1:].max() <= 31
        for b in range(n):
            s = ref["scores"][b * 6:(b + 1) * 6]
            s = s[s > 0]
            assert (np.diff(s) <= 1e-6).all()

    def test_nms_suppresses_duplicates(self):
        """Two cells proposing the SAME box: only the higher score
        survives the RPN NMS."""
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        n, a, h, w = 1, 1, 1, 2
        m = self._model(n, a, h, w, base_size=16, feat_stride=1,
                        ratio=(1.0,), scale=(1.0,),
                        pre_nms_topn=10, post_nms_topn=4,
                        nms_thresh=0.5, min_size=2)
        probs = np.zeros((1, 2, 1, 2), np.float32)
        probs[0, 1] = [[0.9, 0.8]]  # foreground scores
        deltas = np.zeros((1, 4, 1, 2), np.float32)
        # feat_stride=1: the two anchors overlap almost fully (IoU ~ 15/17)
        out = Interpreter(m).run({"probs": probs, "deltas": deltas})
        live = out["scores"] > 0
        assert live.sum() == 1 and abs(out["scores"][0] - 0.9) < 1e-6

    def test_tensorflow_framework_conventions(self):
        """framework='tensorflow' flips the plugin's convention knobs:
        coordinates_offset 0 (widths x2−x1), unrounded anchor ratios,
        zero-centered anchors, anchors clipped to the image pre-decode.
        Checked: interpreter↔XLA parity, and zero-delta anchors decode
        to the zero-centered unrounded anchor boxes exactly."""
        from pyopenvino_tpu.config import Config
        from pyopenvino_tpu.ops.proposal import _anchors, _params
        from pyopenvino_tpu.runtime.compiler import compile_model
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        rng = np.random.default_rng(3)
        n, a, h, w = 2, 2, 4, 4
        m = self._model(n, a, h, w, base_size=8, feat_stride=8,
                        ratio=(0.5, 1.0), scale=(1.0,),
                        pre_nms_topn=20, post_nms_topn=6,
                        nms_thresh=0.5, min_size=2,
                        framework="tensorflow")
        feeds = {
            "probs": rng.uniform(0, 1, (n, 2 * a, h, w)).astype(np.float32),
            "deltas": rng.normal(0, 0.2, (n, 4 * a, h, w)).astype(
                np.float32),
        }
        ref = Interpreter(m).run(feeds)
        got = compile_model(m, Config())(feeds)
        np.testing.assert_allclose(got["rois"], ref["rois"], rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(got["scores"], ref["scores"],
                                   rtol=1e-4, atol=1e-5)
        assert (ref["scores"] > 0).any()
        # knob semantics: zero-centered, UNROUNDED ratio-0.5 anchor
        node = m.find_by_type("Proposal")[0]
        anchors = _anchors(_params(node))
        ws = np.sqrt(64.0 / 0.5)  # no rounding under tf conventions
        np.testing.assert_allclose(
            anchors[0], [-ws / 2, -ws * 0.5 / 2, ws / 2, ws * 0.5 / 2],
            rtol=1e-6)

    def test_unknown_framework_refused(self):
        from pyopenvino_tpu.ir.builder import GraphBuilder

        b = GraphBuilder("x")
        probs = b.parameter("p", (1, 2, 2, 2))
        deltas = b.parameter("d", (1, 4, 2, 2))
        info = b.const(np.asarray([8.0, 8.0, 1.0], np.float32))
        with pytest.raises(NotImplementedError, match="framework"):
            b._add_node("Proposal", [probs, deltas, info], {
                "base_size": "8", "feat_stride": "8", "ratio": "1.0",
                "scale": "1.0", "pre_nms_topn": "10",
                "post_nms_topn": "4", "nms_thresh": "0.5",
                "min_size": "2", "framework": "mxnet",
            }, "p2", n_outputs=2)


def test_two_stage_proposal_roialign_composition():
    """The full RPN → ROIAlign stage composed in ONE graph: proposals
    feed roi_align's boxes with the batch column gathered off — the
    Faster-RCNN wiring, end to end under jit."""
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    rng = np.random.default_rng(1)
    n, a, h, w = 1, 2, 4, 4
    post = 4
    b = GraphBuilder("faster")
    feat = b.parameter("feat", (n, 8, 4, 4))
    probs = b.parameter("probs", (n, 2 * a, h, w))
    deltas = b.parameter("deltas", (n, 4 * a, h, w))
    info = b.const(np.asarray([32.0, 32.0, 1.0], np.float32), "im")
    rois, _sc = b.proposal(probs, deltas, info, base_size=8,
                           feat_stride=8, ratio=(0.5, 1.0), scale=(1.0,),
                           pre_nms_topn=20, post_nms_topn=post,
                           nms_thresh=0.5, min_size=2)
    # split the (post, 5) rois into batch indices + boxes
    boxes = b.gather(rois, [1, 2, 3, 4], axis=1)
    bidx = b.convert(
        b.reshape(b.gather(rois, [0], axis=1), (post,)), "i32")
    pooled = b.roi_align(feat, boxes, bidx, pooled_h=2, pooled_w=2,
                         sampling_ratio=2, spatial_scale=4.0 / 32.0)
    b.result(pooled, "pooled")
    m = b.build()

    feeds = {
        "feat": rng.standard_normal((n, 8, 4, 4)).astype(np.float32),
        "probs": rng.uniform(0, 1, (n, 2 * a, h, w)).astype(np.float32),
        "deltas": rng.normal(0, 0.2, (n, 4 * a, h, w)).astype(np.float32),
    }
    ref = Interpreter(m).run(feeds)["pooled"]
    got = compile_model(m, Config())(feeds)["pooled"]
    assert ref.shape == (post, 8, 2, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
    assert np.abs(ref).max() > 0


def test_proposal_small_pool_and_padding_parity():
    """Review regressions: (a) builder defaults (pre=6000, post=300) on a
    tiny feature map — the candidate pool is smaller than post_nms_topn
    and the compiled path must zero-pad instead of crashing at reshape;
    (b) padding rows are ALL-zero (batch column included) in both
    executors for an underfull batch>=2."""
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    n, a, h, w = 2, 2, 3, 3  # pool = 2*3*3 = 18 << post default 300
    b = GraphBuilder("rpn_small")
    probs = b.parameter("probs", (n, 2 * a, h, w))
    deltas = b.parameter("deltas", (n, 4 * a, h, w))
    info = b.const(np.asarray([24.0, 24.0, 1.0], np.float32), "im")
    rois, sc = b.proposal(probs, deltas, info, base_size=8, feat_stride=8,
                          ratio=(0.5, 1.0), scale=(1.0,))  # defaults
    b.result(rois, "rois")
    b.result(sc, "scores")
    m = b.build()
    rng = np.random.default_rng(2)
    feeds = {
        "probs": rng.uniform(0, 1, (n, 2 * a, h, w)).astype(np.float32),
        "deltas": rng.normal(0, 0.2, (n, 4 * a, h, w)).astype(np.float32),
    }
    ref = Interpreter(m).run(feeds)
    got = compile_model(m, Config())(feeds)
    assert ref["rois"].shape == (n * 300, 5)
    np.testing.assert_allclose(got["rois"], ref["rois"], rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(got["scores"], ref["scores"], rtol=1e-4,
                               atol=1e-5)
    # batch 1 is underfull: its padding rows are all-zero incl. column 0
    pad_rows = ref["rois"][300:][ref["scores"][300:] == 0]
    assert pad_rows.size and np.all(pad_rows == 0)
    got_pad = got["rois"][300:][got["scores"][300:] == 0]
    assert np.all(got_pad == 0)


def test_detection_output_variance_encoded_in_target():
    """vet=1: proposals carry ONE row (no variances) and deltas decode
    raw — previously asserted unsupported."""
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    P, nc = 6, 3
    rng = np.random.default_rng(3)
    # priors as a 1-row const (normalized corners)
    centers = rng.uniform(0.2, 0.8, (P, 2))
    sizes = rng.uniform(0.1, 0.3, (P, 2))
    priors = np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], axis=1
    ).astype(np.float32).reshape(1, 1, P * 4)

    b = GraphBuilder("vet")
    loc = b.parameter("loc", (1, P * 4))
    conf = b.parameter("conf", (1, P * nc))
    pri = b.const(priors)
    det = b._add_node("DetectionOutput", [loc, conf, pri], {
        "num_classes": str(nc), "background_label_id": "0",
        "top_k": "-1", "keep_top_k": str(P),
        "nms_threshold": "0.45", "confidence_threshold": "0.1",
        "code_type": "caffe.PriorBoxParameter.CENTER_SIZE",
        "share_location": "1", "variance_encoded_in_target": "1",
        "clip_after_nms": "0", "clip_before_nms": "0",
        "decrease_label_id": "0", "normalized": "1",
    }, "do")
    b.result(det, "out")
    m = b.build()
    feeds = {
        "loc": rng.normal(0, 0.1, (1, P * 4)).astype(np.float32),
        "conf": rng.uniform(0, 1, (1, P * nc)).astype(np.float32),
    }
    ref = Interpreter(m).run(feeds)["out"]
    got = compile_model(m, Config())(feeds)["out"]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    from pyopenvino_tpu.metrics import parse_detection_records
    dets = parse_detection_records(ref)
    assert dets  # something decodes
    # batched path too
    net = compile_model(m, Config())
    rows = {k: np.repeat(v, 3, axis=0) for k, v in feeds.items()}
    out_b = net.infer_batch(rows)["out"]
    for i in range(3):
        np.testing.assert_allclose(out_b[i], ref[0], rtol=1e-4, atol=1e-5)
