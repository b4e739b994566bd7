"""RegionYolo / TopK / Select ops and the yolo-tiny family.

The reference has no YOLO support at all (no RegionYolo plugin in
pyopenvino/op_plugins/ — such an IR dies at inference_engine.py:270-272);
this covers the op semantics, the programmatic tiny-YOLO-v2 family
(tools/gen_yolo.py) across backends and quant modes, and the host-side
box decode (metrics.decode_region_yolo), i.e. the OMZ yolo demo split.
"""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.metrics import decode_region_yolo
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter
from tools.gen_yolo import ANCHORS, CLASSES, COORDS, GRID, NUM, build_yolo_tiny


def _sig(v):
    return 1.0 / (1.0 + np.exp(-v))


# -- RegionYolo op semantics --------------------------------------------------

def _region_model(c, h, w, **kw):
    b = GraphBuilder("ry")
    x = b.parameter("x", (1, c, h, w))
    y = b.region_yolo(x, **kw)
    b.result(y, "out")
    return b.build()


def test_region_yolo_v2_semantics():
    """do_softmax=1 (YOLO v2): logistic on x/y/obj, class softmax per
    anchor, w/h raw, output flattened over [axis, end_axis]."""
    na, classes, coords, h, w = 2, 3, 4, 2, 2
    block = coords + 1 + classes
    m = _region_model(na * block, h, w, classes=classes, num=na,
                      anchors=[1.0] * (2 * na), do_softmax=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, na * block, h, w)).astype(np.float32)
    out = Interpreter(m).run({"x": x})["out"]
    assert out.shape == (1, na * block * h * w)
    t = out.reshape(na, block, h, w)
    xb = x.reshape(na, block, h, w)
    np.testing.assert_allclose(t[:, 0], _sig(xb[:, 0]), rtol=1e-5)
    np.testing.assert_allclose(t[:, 1], _sig(xb[:, 1]), rtol=1e-5)
    np.testing.assert_allclose(t[:, 2:coords], xb[:, 2:coords], rtol=1e-6)
    np.testing.assert_allclose(t[:, coords], _sig(xb[:, coords]), rtol=1e-5)
    cls = t[:, coords + 1:]
    np.testing.assert_allclose(cls.sum(axis=1), np.ones((na, h, w)),
                               rtol=1e-5)
    # compiled path agrees
    got = compile_model(m, Config())({"x": x})["out"]
    np.testing.assert_allclose(got, out, rtol=1e-4, atol=1e-5)


def test_region_yolo_v3_semantics():
    """do_softmax=0 (YOLO v3): mask selects the anchor count, classes get
    logistic, NCHW shape preserved."""
    mask, classes, coords, h, w = (3, 4, 5), 2, 4, 3, 3
    na = len(mask)
    block = coords + 1 + classes
    m = _region_model(na * block, h, w, classes=classes, num=9,
                      anchors=[1.0] * 18, do_softmax=False, mask=mask)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, na * block, h, w)).astype(np.float32)
    out = Interpreter(m).run({"x": x})["out"]
    assert out.shape == x.shape
    t = out.reshape(na, block, h, w)
    xb = x.reshape(na, block, h, w)
    np.testing.assert_allclose(t[:, coords + 1:], _sig(xb[:, coords + 1:]),
                               rtol=1e-5)
    got = compile_model(m, Config())({"x": x})["out"]
    np.testing.assert_allclose(got, out, rtol=1e-4, atol=1e-5)


def test_region_yolo_channel_mismatch_fails_fast():
    with pytest.raises(ValueError, match="C=10"):
        _region_model(10, 2, 2, classes=3, num=2, anchors=[1.0] * 4)


# -- TopK / Select ------------------------------------------------------------

def _topk_model(shape, k, **kw):
    b = GraphBuilder("tk")
    x = b.parameter("x", shape)
    vals, idx = b.top_k(x, k, **kw)
    b.result(vals, "vals")
    b.result(idx, "idx")
    return b.build()


@pytest.mark.parametrize("mode", ["max", "min"])
@pytest.mark.parametrize("sort", ["value", "index"])
def test_topk_modes(mode, sort):
    m = _topk_model((2, 7), 3, axis=1, mode=mode, sort=sort)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 7)).astype(np.float32)
    ref = Interpreter(m).run({"x": x})
    got = compile_model(m, Config())({"x": x})
    np.testing.assert_allclose(got["vals"], ref["vals"], rtol=1e-6)
    np.testing.assert_array_equal(got["idx"], ref["idx"])
    sign = -1 if mode == "max" else 1
    want_idx = np.argsort(sign * x, axis=1, kind="stable")[:, :3]
    if sort == "index":
        want_idx = np.sort(want_idx, axis=1)
    np.testing.assert_array_equal(ref["idx"], want_idx)
    assert ref["idx"].dtype == np.int32


def test_topk_tie_break_lower_index():
    """Equal values: both executors pick the LOWER index."""
    m = _topk_model((1, 5), 2, axis=1, mode="max")
    x = np.asarray([[1.0, 3.0, 3.0, 0.0, 3.0]], np.float32)
    ref = Interpreter(m).run({"x": x})
    got = compile_model(m, Config())({"x": x})
    np.testing.assert_array_equal(ref["idx"], [[1, 2]])
    np.testing.assert_array_equal(got["idx"], [[1, 2]])


def test_topk_k_validation():
    with pytest.raises(ValueError, match="exceeds axis extent"):
        _topk_model((1, 3), 5, axis=1)


def test_select_broadcast():
    b = GraphBuilder("sel")
    c = b.parameter("c", (2, 1))
    x = b.parameter("x", (2, 3))
    y = b.parameter("y", (1, 3))
    b.result(b.select(b.convert(c, "boolean"), x, y), "out")
    m = b.build()
    cond = np.asarray([[1], [0]], np.float32)
    xv = np.arange(6, dtype=np.float32).reshape(2, 3)
    yv = np.asarray([[10, 11, 12]], np.float32)
    want = np.where(cond.astype(bool), xv, yv)
    ref = Interpreter(m).run({"c": cond, "x": xv, "y": yv})["out"]
    got = compile_model(m, Config())({"c": cond, "x": xv, "y": yv})["out"]
    np.testing.assert_array_equal(ref, want)
    np.testing.assert_allclose(got, want)


# -- yolo-tiny family ---------------------------------------------------------

@pytest.fixture(scope="module")
def yolo():
    return build_yolo_tiny()


def test_yolo_tiny_differential(yolo):
    rng = np.random.default_rng(3)
    blob = rng.uniform(0, 255, (1, 3, 160, 160)).astype(np.float32)
    ref = Interpreter(yolo).run({"data": blob})
    for backend in (Backend.XLA, Backend.PALLAS):
        out = compile_model(yolo, Config(backend=backend))({"data": blob})
        k = next(iter(out))
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-3, atol=1e-4)


def test_yolo_tiny_int8_decode_agreement(yolo):
    """int8w / int8full keep the decoded detections consistent with fp32:
    same top class at matching locations (the detection-level agreement a
    demo user sees)."""
    rng = np.random.default_rng(4)
    blob = rng.uniform(0, 255, (1, 3, 160, 160)).astype(np.float32)
    outs = {}
    for mode in (QuantMode.NONE, QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        cfg = Config(quant=mode)
        net = compile_model(
            yolo, cfg,
            calibration_samples=[{"data": blob}]
            if mode == QuantMode.INT8_FULL else None,
        )
        out = net({"data": blob})
        outs[mode] = decode_region_yolo(
            next(iter(out.values())), (GRID, GRID), ANCHORS, CLASSES,
            conf_threshold=0.25)
    fp32 = outs[QuantMode.NONE]
    assert 1 <= len(fp32) <= 30  # sparse, realistic
    confs = [c for _, c, _ in fp32]
    assert confs == sorted(confs, reverse=True)
    for mode in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        got = outs[mode]
        assert abs(len(got) - len(fp32)) <= 2, (len(got), len(fp32))
        # top detection matches class and localizes to the same cell
        (c0, s0, b0), (c1, s1, b1) = fp32[0], got[0]
        assert c0 == c1
        assert abs(s0 - s1) < 0.1
        assert max(abs(a - b) for a, b in zip(b0, b1)) < 0.08


def test_yolo_tiny_batched(yolo):
    """The vmap batched path covers RegionYolo (reshape/softmax under a
    batch dim)."""
    rng = np.random.default_rng(5)
    rows = rng.uniform(0, 255, (4, 3, 160, 160)).astype(np.float32)
    net = compile_model(yolo, Config())
    got = net.infer_batch({"data": rows})
    k = next(iter(got))
    for i in range(4):
        single = net({"data": rows[i:i + 1]})[k]
        np.testing.assert_allclose(got[k][i], single[0], rtol=1e-4,
                                   atol=1e-5)


def test_decode_region_yolo_geometry():
    """Closed-form decode check: a single hot cell with known offsets
    produces the analytically-expected box."""
    na, classes, coords, h, w = 1, 2, 4, 4, 4
    block = coords + 1 + classes
    t = np.zeros((na, block, h, w), np.float32)
    # activated values (the op applies sigmoid/softmax; decode consumes them)
    t[0, 0, 1, 2] = 0.5      # bx -> (0.5 + 2)/4
    t[0, 1, 1, 2] = 0.25     # by -> (0.25 + 1)/4
    t[0, 2, 1, 2] = np.log(2.0)  # bw = 2 * aw / w
    t[0, 3, 1, 2] = 0.0          # bh = ah / h
    t[0, 4, 1, 2] = 0.9      # obj
    t[0, 5, 1, 2] = 0.8      # class 0 prob
    t[0, 6, 1, 2] = 0.2
    dets = decode_region_yolo(
        t.reshape(1, -1), (h, w), [(1.0, 1.5)], classes,
        conf_threshold=0.3)
    assert len(dets) == 1
    cls, conf, (x0, y0, x1, y1) = dets[0]
    assert cls == 0 and abs(conf - 0.9 * 0.8) < 1e-6
    cx, cy = (0.5 + 2) / 4, (0.25 + 1) / 4
    bw, bh = 2.0 * 1.0 / 4, 1.5 / 4
    np.testing.assert_allclose(
        (x0, y0, x1, y1),
        (cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2), rtol=1e-6)


# -- NonMaxSuppression (opset9, ops/nms.py) -----------------------------------

def _nms_model(nb, nc, n=1, **kw):
    b = GraphBuilder("nms")
    boxes = b.parameter("boxes", (n, nb, 4))
    scores = b.parameter("scores", (n, nc, nb))
    idx, sel, valid = b.non_max_suppression(boxes, scores, **kw)
    b.result(idx, "idx")
    b.result(sel, "sel")
    b.result(valid, "valid")
    return b.build()


def _rand_nms_inputs(seed, n, nb, nc):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.1, 0.9, (n, nb, 2))
    sizes = rng.uniform(0.05, 0.4, (n, nb, 2))
    boxes = np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], axis=-1
    ).astype(np.float32)  # (y1, x1, y2, x2)
    scores = rng.uniform(0, 1, (n, nc, nb)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("sort_desc", [True, False])
def test_nms_interpreter_vs_compiled(sort_desc):
    m = _nms_model(12, 3, n=2, max_boxes=4, iou_threshold=0.5,
                   score_threshold=0.2, sort_result_descending=sort_desc)
    boxes, scores = _rand_nms_inputs(0, 2, 12, 3)
    ref = Interpreter(m).run({"boxes": boxes, "scores": scores})
    got = compile_model(m, Config())({"boxes": boxes, "scores": scores})
    assert ref["idx"].shape == (2 * 3 * 4, 3)
    np.testing.assert_array_equal(got["idx"], ref["idx"])
    np.testing.assert_allclose(got["sel"], ref["sel"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["valid"], ref["valid"])
    v = int(ref["valid"][0])
    assert 0 < v <= 24
    assert (ref["idx"][v:] == -1).all() and (ref["idx"][:v] >= 0).all()
    if sort_desc:
        s = ref["sel"][:v, 2]
        assert (np.diff(s) <= 1e-6).all()


def test_nms_sequential_greedy_not_kill_matrix():
    """The A>B>C overlap chain that separates true greedy NMS from the
    kill-matrix formulation: A suppresses B, but C (overlapped only by
    the already-suppressed B) SURVIVES."""
    boxes = np.asarray([[
        [0.0, 0.0, 1.0, 1.0],     # A
        [0.0, 0.6, 1.0, 1.6],     # B: IoU(A,B) ≈ 0.25 — overlaps A
        [0.0, 1.2, 1.0, 2.2],     # C: overlaps B (IoU≈0.25), not A
    ]], np.float32)
    scores = np.asarray([[[0.9, 0.8, 0.7]]], np.float32)
    m = _nms_model(3, 1, max_boxes=3, iou_threshold=0.2)
    ref = Interpreter(m).run({"boxes": boxes, "scores": scores})
    got = compile_model(m, Config())({"boxes": boxes, "scores": scores})
    assert int(ref["valid"][0]) == 2
    np.testing.assert_array_equal(ref["idx"][:2, 2], [0, 2])  # A and C
    np.testing.assert_array_equal(got["idx"], ref["idx"])


def test_nms_center_encoding_and_flipped_corners():
    # center encoding: (cx, cy, w, h); identical geometry as corner twin
    boxes_c = np.asarray([[[0.5, 0.5, 1.0, 1.0],
                           [0.5, 0.5, 1.0, 1.0]]], np.float32)
    scores = np.asarray([[[0.9, 0.8]]], np.float32)
    m = _nms_model(2, 1, max_boxes=2, iou_threshold=0.5,
                   box_encoding="center")
    ref = Interpreter(m).run({"boxes": boxes_c, "scores": scores})
    assert int(ref["valid"][0]) == 1  # identical boxes: second suppressed
    # flipped corners normalize (the spec allows either corner order)
    boxes_f = np.asarray([[[1.0, 1.0, 0.0, 0.0],
                           [0.0, 0.0, 1.0, 1.0]]], np.float32)
    m2 = _nms_model(2, 1, max_boxes=2, iou_threshold=0.5)
    ref2 = Interpreter(m2).run({"boxes": boxes_f, "scores": scores})
    assert int(ref2["valid"][0]) == 1


def test_nms_negative_sigma_refused():
    b = GraphBuilder("soft")
    boxes = b.parameter("boxes", (1, 4, 4))
    scores = b.parameter("scores", (1, 1, 4))
    ins = [boxes, scores,
           b.const(np.asarray(2, np.int64)),
           b.const(np.asarray(0.5, np.float32)),
           b.const(np.asarray(0.0, np.float32)),
           b.const(np.asarray(-0.5, np.float32))]  # bad soft_nms_sigma
    with pytest.raises(ValueError, match="non-negative"):
        b._add_node("NonMaxSuppression", ins, {}, "n", n_outputs=3)


# -- Soft-NMS (soft_nms_sigma > 0) --------------------------------------------

@pytest.mark.parametrize("sort_desc", [True, False])
@pytest.mark.parametrize("seed", [0, 5])
def test_soft_nms_interpreter_vs_xla(seed, sort_desc):
    m = _nms_model(12, 2, n=2, max_boxes=6, iou_threshold=0.6,
                   score_threshold=0.05, soft_nms_sigma=0.5,
                   sort_result_descending=sort_desc)
    boxes, scores = _rand_nms_inputs(seed, 2, 12, 2)
    feeds = {"boxes": boxes, "scores": scores}
    ref = Interpreter(m).run(feeds)
    got = compile_model(m, Config())(feeds)
    np.testing.assert_array_equal(got["idx"], ref["idx"])
    np.testing.assert_allclose(got["sel"], ref["sel"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(got["valid"], ref["valid"])
    # decayed scores are reported: every overlapping later pick scores
    # strictly below its raw score
    live = ref["idx"][:, 0] >= 0
    raw = scores[ref["idx"][live, 0], ref["idx"][live, 1],
                 ref["idx"][live, 2]]
    assert (ref["sel"][live, 2] <= raw + 1e-6).all()


def test_soft_nms_against_tensorflow_v5():
    """Cross-check the Gaussian decay against TF's
    non_max_suppression_with_scores (the kernel NMS-5 was introduced to
    convert).  iou_threshold=1.0 so the hard-suppression branch (where
    the TF and OpenVINO realizations differ) never fires and the pure
    soft decay is what's compared."""
    tf = pytest.importorskip("tensorflow")

    boxes, scores = _rand_nms_inputs(11, 1, 10, 1)
    sigma, max_out, score_thr = 0.4, 6, 0.1
    sel, tf_scores = tf.image.non_max_suppression_with_scores(
        boxes[0], scores[0, 0], max_output_size=max_out,
        iou_threshold=1.0, score_threshold=score_thr,
        soft_nms_sigma=sigma)
    m = _nms_model(10, 1, n=1, max_boxes=max_out, iou_threshold=1.0,
                   score_threshold=score_thr, soft_nms_sigma=sigma)
    out = Interpreter(m).run({"boxes": boxes, "scores": scores})
    k = int(out["valid"][0])
    assert k == len(sel.numpy())
    np.testing.assert_array_equal(out["idx"][:k, 2], sel.numpy())
    np.testing.assert_allclose(out["sel"][:k, 2], tf_scores.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_soft_nms_sigma_zero_matches_hard():
    """sigma=0 must reduce to the plain greedy path bit-for-bit."""
    m_hard = _nms_model(8, 1, max_boxes=4, iou_threshold=0.5)
    m_soft = _nms_model(8, 1, max_boxes=4, iou_threshold=0.5,
                        soft_nms_sigma=0.0)
    boxes, scores = _rand_nms_inputs(2, 1, 8, 1)
    feeds = {"boxes": boxes, "scores": scores}
    a = Interpreter(m_hard).run(feeds)
    c = Interpreter(m_soft).run(feeds)
    for k in a:
        np.testing.assert_array_equal(a[k], c[k])


# -- ReorgYolo / VariadicSplit / on-device decode (yolo-v2 family) ------------

@pytest.mark.parametrize("c,h,w,s", [(4, 4, 6, 2), (64, 26, 26, 2),
                                     (18, 9, 9, 3)])
def test_reorg_yolo_parity(c, h, w, s):
    """The darknet reorg mapping (ops/yolo.py _reorg_math): the literal
    kernel-loop numpy twin and the vectorized XLA emit must agree —
    including the canonical yolo-v2 (64, 26, 26) stride-2 case."""
    b = GraphBuilder("rg")
    x = b.parameter("x", (2, c, h, w))
    b.result(b.reorg_yolo(x, stride=s), "y")
    m = b.build()
    rng = np.random.default_rng(c)
    blob = rng.standard_normal((2, c, h, w)).astype(np.float32)
    ref = Interpreter(m).run({"x": blob})
    got = compile_model(m, Config())({"x": blob})
    assert ref["y"].shape == (2, c * s * s, h // s, w // s)
    np.testing.assert_array_equal(got["y"], ref["y"])


def test_reorg_yolo_is_not_space_to_depth():
    """Regression guard for the classic wrong implementation: darknet's
    reorg differs from SpaceToDepth in channel order."""
    b = GraphBuilder("cmp")
    x = b.parameter("x", (1, 4, 4, 4))
    b.result(b.reorg_yolo(x, stride=2), "reorg")
    b.result(b.space_to_depth(x, 2), "s2d")
    ref = Interpreter(b.build()).run(
        {"x": np.arange(64, dtype=np.float32).reshape(1, 4, 4, 4)})
    assert not np.array_equal(ref["reorg"], ref["s2d"])


def test_reorg_yolo_bad_shape_refused():
    b = GraphBuilder("bad")
    x = b.parameter("x", (1, 6, 4, 4))  # C not divisible by s^2
    with pytest.raises(ValueError, match="divisible"):
        b.reorg_yolo(x, stride=2)


def test_variadic_split_with_wildcard():
    b = GraphBuilder("vs")
    x = b.parameter("x", (1, 10, 3))
    parts = b.variadic_split(x, 1, [2, -1, 3])
    for i, p in enumerate(parts):
        b.result(p, f"p{i}")
    m = b.build()
    rng = np.random.default_rng(0)
    blob = rng.standard_normal((1, 10, 3)).astype(np.float32)
    ref = Interpreter(m).run({"x": blob})
    assert [ref[f"p{i}"].shape[1] for i in range(3)] == [2, 5, 3]
    np.testing.assert_array_equal(
        np.concatenate([ref["p0"], ref["p1"], ref["p2"]], 1), blob)
    got = compile_model(m, Config())({"x": blob})
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_variadic_split_bad_lengths():
    b = GraphBuilder("vs")
    x = b.parameter("x", (1, 10))
    with pytest.raises(ValueError, match="sum to"):
        b.variadic_split(x, 1, [2, 3])
    with pytest.raises(ValueError, match="-1"):
        b.variadic_split(x, 1, [-1, -1, 2])


def test_yolo_v2_on_device_decode_matches_host_decoder():
    """The on-device decode+NMS graph (tools/gen_yolo.py
    append_yolo_decode) must produce the same detections the OMZ-style
    host decoder (metrics.decode_region_yolo) computes from the same
    region blob — same (class, score, box) set at the same thresholds,
    with an uncapped keep budget so the comparison is exact."""
    from pyopenvino_tpu.ops.yolo import region_yolo_ref
    from tools.gen_yolo import append_yolo_decode

    na, classes, h, w = 3, 4, 5, 5
    anchors = ((0.8, 1.0), (1.5, 1.2), (2.5, 2.0))
    block = 4 + 1 + classes
    rng = np.random.default_rng(1)
    raw = rng.normal(0, 1.2, (1, na * block, h, w)).astype(np.float32)
    p = dict(coords=4, classes=classes, num=na, do_softmax=True,
             mask=(), axis=1, end_axis=3)
    blob = region_yolo_ref(raw, p)          # activated + flattened

    b = GraphBuilder("decode")
    region = b.parameter("region", blob.shape)
    rec_port = append_yolo_decode(
        b, region, (h, w), anchors, classes, max_out=na * h * w,
        iou_threshold=0.45, score_threshold=0.3)
    b.result(rec_port, "detections")
    m = b.build()

    rec = Interpreter(m).run({"region": blob})["detections"]
    host = decode_region_yolo(blob, (h, w), list(anchors), classes,
                              conf_threshold=0.3, iou_threshold=0.45)
    live = rec[rec[:, 0] >= 0]
    assert len(live) == len(host) > 0
    dev = sorted(
        (int(r[1]), round(float(r[2]), 4), tuple(np.round(r[3:], 4)))
        for r in live)
    hst = sorted(
        (c, round(s, 4), tuple(np.round(box, 4))) for c, s, box in host)
    for d, hrow in zip(dev, hst):
        assert d[0] == hrow[0] and abs(d[1] - hrow[1]) < 2e-4
        np.testing.assert_allclose(d[2], hrow[2], atol=2e-4)
    got = compile_model(m, Config())({"region": blob})["detections"]
    np.testing.assert_allclose(got, rec, rtol=1e-3, atol=2e-3)


def test_yolo_v2_family_records_and_xla_parity():
    """The 17th family end to end: the model itself emits the
    DetectionOutput-style record table (zero host postprocessing), rows
    score-sorted with -1 padding, and both executors agree."""
    from tools.gen_yolo import build_yolo_v2

    m = build_yolo_v2()
    assert m.find_by_type("ReorgYolo") and m.find_by_type(
        "VariadicSplit") and m.find_by_type("NonMaxSuppression")
    rng = np.random.default_rng(0)
    feed = {"data": rng.uniform(0, 255, (1, 3, 160, 160)).astype(
        np.float32)}
    rec = Interpreter(m).run(feed)["detections"]
    live = rec[rec[:, 0] >= 0]
    assert 1 <= len(live) <= rec.shape[0]
    confs = live[:, 2]
    assert (np.diff(confs) <= 1e-6).all()      # score-sorted
    assert (rec[len(live):, 0] == -1).all()    # contiguous -1 padding
    got = compile_model(m, Config())(feed)["detections"]
    np.testing.assert_allclose(got, rec, rtol=1e-3, atol=2e-3)
