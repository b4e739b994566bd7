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
