"""SSD head ops: PriorBoxClustered and DetectionOutput.

Reference semantics: op_plugins/PriorBoxClustered.py:10-40 (anchor grid,
row 0 = normalized boxes, row 1 = tiled variances) and
op_plugins/DetectionOutput.py:162-260 (argmax class per prior → confidence +
background screening → CENTER_SIZE/CORNER decode with variances → optional
clipping → class-agnostic pairwise-suppression NMS → confidence-sorted
fixed-shape (1, 1, keep_top_k, 7) records with a -1 terminator row).

TPU design (SURVEY.md §7 hard part 1): the reference's dynamic-length
filtering (np.append loops, DetectionOutput.py:69-94) becomes fixed-shape
masked computation — decode all priors, build a validity mask, run the O(P²)
IoU suppression as one masked matrix expression, and materialize the record
table with a vectorized rank comparison.  P=1917 → the IoU matrix is ~3.7M
elements, trivial for the VPU.

NMS parity note: the reference suppresses over *all* pairs regardless of
earlier kills (DetectionOutput.py:41-49), i.e. box i survives iff no
overlapping box j has strictly higher confidence (ties kill the later index).
That is exactly `kill[i] = ∃j: iou>T ∧ (conf_j > conf_i ∨ (conf_j = conf_i ∧
j < i))`, which both backends implement.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


# ---------------------------------------------------------------------------
# PriorBoxClustered
# ---------------------------------------------------------------------------


def prior_boxes_clustered(
    grid_hw, image_hw, widths, heights, step, step_h, step_w, offset,
    variance, img_h, img_w,
) -> np.ndarray:
    gh, gw = int(grid_hw[0]), int(grid_hw[1])
    ih, iw = int(image_hw[0]), int(image_hw[1])
    img_h = float(ih) if img_h == 0 else img_h
    img_w = float(iw) if img_w == 0 else img_w
    sh = step if step_h == 0 else step_h
    sw = step if step_w == 0 else step_w
    sh = img_h / gh if sh == 0 else sh
    sw = img_w / gw if sw == 0 else sw

    widths = np.asarray(widths, dtype=np.float64)
    heights = np.asarray(heights, dtype=np.float64)
    npriors = len(widths)

    cx = (np.arange(gw, dtype=np.float64) + offset) * sw  # (gw,)
    cy = (np.arange(gh, dtype=np.float64) + offset) * sh  # (gh,)
    # per (gy, gx, k): corners normalized by image size
    cx = cx[None, :, None]
    cy = cy[:, None, None]
    xmin = (cx - widths / 2) / img_w
    ymin = (cy - heights / 2) / img_h
    xmax = (cx + widths / 2) / img_w
    ymax = (cy + heights / 2) / img_h
    boxes = np.stack(
        [
            np.broadcast_to(xmin, (gh, gw, npriors)),
            np.broadcast_to(ymin, (gh, gw, npriors)),
            np.broadcast_to(xmax, (gh, gw, npriors)),
            np.broadcast_to(ymax, (gh, gw, npriors)),
        ],
        axis=-1,
    ).reshape(-1)
    variances = np.tile(np.asarray(variance, dtype=np.float64), gh * gw * npriors)
    return np.stack([boxes, variances]).astype(np.float32)


def _pbc_params(node):
    return dict(
        widths=A.get_float_tuple(node.attrs, "width", (1.0,)),
        heights=A.get_float_tuple(node.attrs, "height", (1.0,)),
        step=A.get_float(node.attrs, "step", 0.0),
        step_h=A.get_float(node.attrs, "step_h", 0.0),
        step_w=A.get_float(node.attrs, "step_w", 0.0),
        offset=A.get_float(node.attrs, "offset"),
        variance=A.get_float_tuple(node.attrs, "variance", ()),
        img_h=A.get_float(node.attrs, "img_h", 0.0),
        img_w=A.get_float(node.attrs, "img_w", 0.0),
    )


def prior_boxes(grid_hw, image_hw, p) -> np.ndarray:
    """opset1 PriorBox (the classic SSD300-VGG anchor generator — the
    NON-clustered sibling of prior_boxes_clustered; the reference has
    neither beyond the clustered one its single SSD model uses).

    Per-cell box order follows the OpenVINO/Caffe spec: for each
    min_size — the square min box, then (if max_size) the
    sqrt(min·max) square, then each aspect-ratio box (flip appending
    1/ar).  Output (2, 4·H·W·P): row 0 corner boxes normalized by the
    image size (optionally clipped), row 1 tiled variances."""
    gh, gw = int(grid_hw[0]), int(grid_hw[1])
    ih, iw = int(image_hw[0]), int(image_hw[1])
    step = p["step"]
    # step==0: cell-sized steps with the OpenVINO reference's FIXED 0.5
    # center offset (the offset attr applies only with an explicit step)
    sh = ih / gh if step == 0 else step
    sw = iw / gw if step == 0 else step
    offset = 0.5 if step == 0 else p["offset"]

    wh = _pb_wh_list(p)
    npriors = len(wh)
    cx = (np.arange(gw, dtype=np.float64) + offset) * sw
    cy = (np.arange(gh, dtype=np.float64) + offset) * sh
    ws = np.asarray([w for w, _ in wh], np.float64)
    hs = np.asarray([h for _, h in wh], np.float64)
    cx = cx[None, :, None]
    cy = cy[:, None, None]
    xmin = (cx - ws / 2) / iw
    ymin = (cy - hs / 2) / ih
    xmax = (cx + ws / 2) / iw
    ymax = (cy + hs / 2) / ih
    boxes = np.stack(
        [
            np.broadcast_to(xmin, (gh, gw, npriors)),
            np.broadcast_to(ymin, (gh, gw, npriors)),
            np.broadcast_to(xmax, (gh, gw, npriors)),
            np.broadcast_to(ymax, (gh, gw, npriors)),
        ],
        axis=-1,
    )
    if p["clip"]:
        boxes = np.clip(boxes, 0.0, 1.0)
    boxes = boxes.reshape(-1)
    variance = p["variance"] or (0.1,)
    if len(variance) not in (1, 4):
        raise ValueError(
            f"PriorBox: variance must have 1 or 4 entries, got "
            f"{len(variance)}")
    variances = np.tile(np.asarray(variance, np.float64),
                        gh * gw * npriors * (4 // len(variance)))
    return np.stack([boxes, variances]).astype(np.float32)


def _pb_params(node):
    for unsupported in ("fixed_size", "fixed_ratio", "density"):
        if A.get_float_tuple(node.attrs, unsupported, ()):
            raise NotImplementedError(
                f"PriorBox: attribute {unsupported!r} is not supported — "
                "anchors would be silently generated from min/max/aspect "
                "only (densified fixed-size anchors are a Caffe-SSD "
                "variant this build does not implement)")
    return dict(
        min_size=A.get_float_tuple(node.attrs, "min_size", ()),
        max_size=A.get_float_tuple(node.attrs, "max_size", ()),
        aspect_ratio=A.get_float_tuple(node.attrs, "aspect_ratio", ()),
        flip=A.get_bool(node.attrs, "flip", False),
        clip=A.get_bool(node.attrs, "clip", False),
        step=A.get_float(node.attrs, "step", 0.0),
        offset=A.get_float(node.attrs, "offset"),
        variance=A.get_float_tuple(node.attrs, "variance", ()),
        scale_all_sizes=A.get_bool(node.attrs, "scale_all_sizes", True),
    )


def _pb_wh_list(p):
    """Per-cell (w, h) anchor list in spec order, pixel units — the ONE
    enumeration both the box generator and shape inference consume.

    scale_all_sizes=True (default): per min_size — the square min box,
    the sqrt(min·max) square when a max_size is paired, then the
    aspect-ratio boxes.  scale_all_sizes=False (the Caffe/MxNet-SSD
    layout): max_size is IGNORED; one square per min_size, plus
    aspect-ratio boxes for min_size[0] only."""
    ars = [1.0]
    for ar in p["aspect_ratio"]:
        if any(abs(ar - a) < 1e-6 for a in ars):
            continue
        ars.append(float(ar))
        if p["flip"] and abs(ar) > 1e-6:
            ars.append(1.0 / float(ar))
    ar_boxes = []

    def add_ar(out, m):
        for ar in ars:
            if abs(ar - 1.0) < 1e-6:
                continue
            r = float(np.sqrt(ar))
            out.append((m * r, m / r))

    wh = []
    min_sizes = list(p["min_size"])
    max_sizes = list(p["max_size"])
    if p["scale_all_sizes"]:
        for i, m in enumerate(min_sizes):
            wh.append((m, m))
            if i < len(max_sizes):
                s = float(np.sqrt(m * max_sizes[i]))
                wh.append((s, s))
            add_ar(wh, m)
    else:
        for m in min_sizes:
            wh.append((m, m))
        if min_sizes:
            add_ar(ar_boxes, min_sizes[0])
        wh.extend(ar_boxes)
    return wh


def _pb_num_priors(p) -> int:
    return len(_pb_wh_list(p))


@register
class PriorBox(Op):
    type_name = "PriorBox"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        grid = in_values.get(0)
        if grid is None:
            raise ValueError(f"PriorBox {node.name}: grid is not static")
        p = _pb_params(node)
        n = 4 * int(grid[0]) * int(grid[1]) * _pb_num_priors(p)
        res = ShapeResult({node.out_port: (2, n)})
        if in_values.get(1) is not None:
            res.values[node.out_port] = prior_boxes(grid, in_values[1], p)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: prior_boxes(
            inputs[0], inputs[1], _pb_params(node))}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        out = prior_boxes(
            ctx.static_value(node, 0), ctx.static_value(node, 1),
            _pb_params(node))
        return {node.out_port: TValue(jnp.asarray(out), "L")}


@register
class PriorBoxClustered(Op):
    type_name = "PriorBoxClustered"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        grid = in_values.get(0)
        if grid is None:
            raise ValueError(f"PriorBoxClustered {node.name}: grid is not static")
        p = _pbc_params(node)
        n = 4 * int(grid[0]) * int(grid[1]) * len(p["widths"])
        res = ShapeResult({node.out_port: (2, n)})
        if in_values.get(1) is not None:
            res.values[node.out_port] = prior_boxes_clustered(
                grid, in_values[1], **p
            )
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = prior_boxes_clustered(inputs[0], inputs[1], **_pbc_params(node))
        return {node.out_port: out}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        grid = ctx.static_value(node, 0)
        image = ctx.static_value(node, 1)
        out = prior_boxes_clustered(grid, image, **_pbc_params(node))
        return {node.out_port: TValue(jnp.asarray(out), "L")}


# ---------------------------------------------------------------------------
# DetectionOutput
# ---------------------------------------------------------------------------


def _do_params(node):
    a = node.attrs
    return dict(
        num_classes=A.get_int(a, "num_classes"),
        background_label_id=A.get_int(a, "background_label_id", 0),
        top_k=A.get_int(a, "top_k", -1),
        variance_encoded_in_target=A.get_bool(a, "variance_encoded_in_target"),
        keep_top_k=A.get_int_tuple(a, "keep_top_k"),
        code_type=A.get_str(a, "code_type", "caffe.PriorBoxParameter.CORNER"),
        share_location=A.get_bool(a, "share_location", True),
        nms_threshold=A.get_float(a, "nms_threshold"),
        confidence_threshold=A.get_float(a, "confidence_threshold", 0.0),
        clip_after_nms=A.get_bool(a, "clip_after_nms"),
        clip_before_nms=A.get_bool(a, "clip_before_nms"),
        decrease_label_id=A.get_bool(a, "decrease_label_id"),
        normalized=A.get_bool(a, "normalized"),
        input_height=A.get_int(a, "input_height", 1),
        input_width=A.get_int(a, "input_width", 1),
    )


def _output_shape(p, num_prior_boxes) -> tuple:
    n = 1
    shape = (1, 1, n * p["num_classes"] * num_prior_boxes, 7)
    if p["keep_top_k"][0] > 0:
        shape = (1, 1, n * p["keep_top_k"][0], 7)
    elif p["keep_top_k"][0] == -1 and p["top_k"] > 0:
        shape = (1, 1, n * p["top_k"] * p["num_classes"], 7)
    return shape


def _decode(xp, boxes, logits, variances, p):
    """Vectorized bbox decode; xp is numpy or jax.numpy.  boxes/logits/
    variances: (P, 4).  Returns (P, 4) [xmin, ymin, xmax, ymax]."""
    bx0, by0, bx1, by1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    lx0, ly0, lx1, ly1 = logits[:, 0], logits[:, 1], logits[:, 2], logits[:, 3]
    if not p["normalized"]:
        bx0 = bx0 / p["input_width"]
        by0 = by0 / p["input_height"]
        bx1 = bx1 / p["input_width"]
        by1 = by1 / p["input_height"]
    vet = p["variance_encoded_in_target"]
    if p["code_type"] == "caffe.PriorBoxParameter.CORNER":
        if vet:
            out = (bx0 + lx0, by0 + ly0, bx1 + lx1, by1 + ly1)
        else:
            out = (
                bx0 + variances[:, 0] * lx0,
                by0 + variances[:, 1] * ly0,
                bx1 + variances[:, 2] * lx1,
                by1 + variances[:, 3] * ly1,
            )
        return xp.stack(out, axis=1)
    # CENTER_SIZE
    pw, ph = bx1 - bx0, by1 - by0
    pcx, pcy = (bx0 + bx1) / 2, (by0 + by1) / 2
    if vet:
        cx = lx0 * pw + pcx
        cy = ly0 * ph + pcy
        w = xp.exp(lx1) * pw
        h = xp.exp(ly1) * ph
    else:
        cx = variances[:, 0] * lx0 * pw + pcx
        cy = variances[:, 1] * ly0 * ph + pcy
        w = xp.exp(variances[:, 2] * lx1) * pw
        h = xp.exp(variances[:, 3] * ly1) * ph
    return xp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def _iou_matrix(xp, b):
    """Pairwise IoU of (P, 4) corner boxes → (P, P)."""
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    x0 = xp.maximum(b[:, None, 0], b[None, :, 0])
    y0 = xp.maximum(b[:, None, 1], b[None, :, 1])
    x1 = xp.minimum(b[:, None, 2], b[None, :, 2])
    y1 = xp.minimum(b[:, None, 3], b[None, :, 3])
    w = x1 - x0
    h = y1 - y0
    # the reference returns 0 when w or h is negative (DetectionOutput.py:26)
    inter = xp.where((w < 0) | (h < 0), 0.0, w * h)
    union = area[:, None] + area[None, :] - inter
    return inter / union


def _top_k_prefilter_np(valid, conf, p):
    """Spec `top_k`: only the top-k candidates (by confidence, ties to the
    lower prior index) enter NMS.  The reference PARSES top_k but never
    applies it (/root/reference/pyopenvino/op_plugins/DetectionOutput.py:282
    — parsed; :162-260 — unused); the OpenVINO/caffe DetectionOutput spec
    applies it pre-NMS.  We follow the spec: it is also the entire
    performance story of this op — the suppression pair count drops from
    P² (1917² for SSD-MobileNet) to top_k² (100²).

    Exactness: a candidate can only be killed by a HIGHER-confidence valid
    box, and every such killer of a top-k box is itself top-k — so the
    keep/kill decision of every surviving record is identical to full NMS;
    only sub-top-k boxes (which could at most fill trailing keep_top_k
    slots after >top_k−keep_top_k kills) are excluded."""
    top_k = p["top_k"]
    P = conf.shape[-1]
    if top_k <= 0 or top_k >= P:
        return valid
    order = np.argsort(np.where(valid, -conf, np.inf), kind="stable")
    sel = np.zeros(P, dtype=bool)
    sel[order[:top_k]] = True
    return valid & sel


def detection_output_ref(box_logits, class_pred, proposals, p) -> np.ndarray:
    """Numpy fixed-shape masked implementation (also the fold/interp path)."""
    # vet=0: proposals carry (boxes, variances); vet=1: a single boxes
    # row — the decode's variance_encoded_in_target branch reads deltas
    # raw (ops/ssd.py _decode)
    want_rows = 1 if p["variance_encoded_in_target"] else 2
    assert proposals.shape[1] == want_rows, (
        f"proposals rows {proposals.shape[1]} != {want_rows} for "
        f"variance_encoded_in_target={p['variance_encoded_in_target']}")
    prior_box_size = 4 if p["normalized"] else 5
    P = proposals.shape[2] // prior_box_size
    nc = p["num_classes"]

    logits = box_logits.reshape(P, 4).astype(np.float64)
    scores = class_pred.reshape(P, nc)
    boxes_p = proposals[0, 0].reshape(P, prior_box_size).astype(np.float64)
    boxes_v = (np.zeros((P, prior_box_size))
               if p["variance_encoded_in_target"]
               else proposals[0, 1].reshape(P, prior_box_size)
               .astype(np.float64))

    cls = scores.argmax(axis=1)
    conf = scores[np.arange(P), cls]
    valid = (conf > p["confidence_threshold"]) & (cls != 0)
    valid = _top_k_prefilter_np(valid, conf, p)

    offset = 0 if p["normalized"] else 1
    decoded = _decode(np, boxes_p[:, offset : offset + 4], logits, boxes_v, p)
    if p["clip_before_nms"]:
        decoded = np.clip(decoded, 0.0, 1.0)

    iou = _iou_matrix(np, decoded)
    j_less = np.arange(P)[None, :] < np.arange(P)[:, None]
    beats = (conf[None, :] > conf[:, None]) | (
        (conf[None, :] == conf[:, None]) & j_less
    )
    overlap = iou > p["nms_threshold"]
    np.fill_diagonal(overlap, False)
    kill = (overlap & beats & valid[None, :]).any(axis=1)
    keep = valid & ~kill

    if p["clip_after_nms"]:
        decoded = np.clip(decoded, 0.0, 1.0)

    out_shape = _output_shape(p, P)
    max_record = out_shape[2]
    res = np.zeros(out_shape, dtype=np.float32)
    order = np.argsort(np.where(keep, -conf, np.inf), kind="stable")
    num_keep = int(keep.sum())
    for n in range(min(max_record, num_keep)):
        i = order[n]
        res[0, 0, n] = [n, cls[i], conf[i], *decoded[i]]
    if num_keep < max_record:
        res[0, 0, num_keep] = [-1, 0, 0, 0, 0, 0, 0]
    return res


def detection_output_jax(box_logits, class_pred, proposals, p):
    """JAX fixed-shape masked implementation (jit-safe, static shapes).

    The O(P²) suppression is a masked matrix expression XLA maps onto the
    VPU.  (A Pallas row-tiled suppression kernel existed through round 1
    but was deleted: Mosaic's compile of it hangs on this backend even
    after the stack update, and the batched path's tiled scan —
    detection_output_jax_batched — covers the production case.)"""
    import jax
    import jax.numpy as jnp

    prior_box_size = 4 if p["normalized"] else 5
    P = proposals.shape[2] // prior_box_size
    nc = p["num_classes"]

    logits = box_logits.reshape(P, 4).astype(jnp.float32)
    scores = class_pred.reshape(P, nc)
    boxes_p = proposals[0, 0].reshape(P, prior_box_size).astype(jnp.float32)
    boxes_v = (jnp.zeros((P, prior_box_size), jnp.float32)
               if p["variance_encoded_in_target"]
               else proposals[0, 1].reshape(P, prior_box_size)
               .astype(jnp.float32))

    cls = jnp.argmax(scores, axis=1)
    conf = jnp.max(scores, axis=1)  # == score at argmax, without the gather
    valid = (conf > p["confidence_threshold"]) & (cls != 0)
    top_k = p["top_k"]
    if 0 < top_k < P:  # spec top_k pre-NMS (see _top_k_prefilter_np)
        _, sel_idx = jax.lax.top_k(jnp.where(valid, conf, -jnp.inf), top_k)
        valid = valid & jnp.zeros(P, bool).at[sel_idx].set(True)

    offset = 0 if p["normalized"] else 1
    decoded = _decode(jnp, boxes_p[:, offset : offset + 4], logits, boxes_v, p)
    if p["clip_before_nms"]:
        decoded = jnp.clip(decoded, 0.0, 1.0)

    iou = _iou_matrix(jnp, decoded)
    idx = jnp.arange(P)
    j_less = idx[None, :] < idx[:, None]
    beats = (conf[None, :] > conf[:, None]) | (
        (conf[None, :] == conf[:, None]) & j_less
    )
    overlap = (iou > p["nms_threshold"]) & (idx[None, :] != idx[:, None])
    kill = (overlap & beats & valid[None, :]).any(axis=1)
    keep = valid & ~kill

    if p["clip_after_nms"]:
        decoded = jnp.clip(decoded, 0.0, 1.0)

    out_shape = _output_shape(p, P)
    max_record = out_shape[2]
    num_keep = keep.sum()

    order = jnp.argsort(jnp.where(keep, -conf, jnp.inf), stable=True)
    top = order[:max_record]
    rank = jnp.arange(max_record)
    is_det = rank < jnp.minimum(num_keep, max_record)
    is_term = rank == num_keep

    records = jnp.stack(
        [
            rank.astype(jnp.float32),
            cls[top].astype(jnp.float32),
            conf[top].astype(jnp.float32),
            decoded[top, 0],
            decoded[top, 1],
            decoded[top, 2],
            decoded[top, 3],
        ],
        axis=1,
    )
    term = jnp.concatenate(
        [jnp.full((max_record, 1), -1.0), jnp.zeros((max_record, 6))], axis=1
    )
    out = jnp.where(
        is_det[:, None], records, jnp.where(is_term[:, None], term, 0.0)
    )
    return out.reshape(out_shape).astype(jnp.float32)


def detection_output_jax_batched(box_logits, class_pred, proposals, p,
                                 row_tile: int = 64):
    """Batched fixed-shape DetectionOutput: all leading-axis examples in one
    device pass.  The O(P²) suppression runs as a lax.scan over row tiles so
    peak memory is B·tile·P (≈ 63 MB at B=128, tile=64, P=1917) instead of
    the B·P²·3 (~45 GB) a naive vmap lift would materialize — that blowup is
    why round 1 fell back to mapping examples sequentially (2.1 ms of the
    SSD batch-32 step, measured via runtime/profiling.py)."""
    import jax
    import jax.numpy as jnp

    B = box_logits.shape[0]
    prior_box_size = 4 if p["normalized"] else 5
    P = proposals.shape[-1] // prior_box_size
    nc = p["num_classes"]

    logits = box_logits.reshape(B, P, 4).astype(jnp.float32)
    scores = class_pred.reshape(B, P, nc)
    # per-example anchors (in the engine they are a broadcast compile-time
    # constant, but the function honors per-example proposals)
    rows = 1 if p["variance_encoded_in_target"] else 2
    props = proposals.reshape(B, rows, P, prior_box_size).astype(
        jnp.float32)
    boxes_p = props[:, 0]                                  # (B, P, pbs)
    boxes_v = (jnp.zeros_like(boxes_p)
               if p["variance_encoded_in_target"] else props[:, 1])

    cls = jnp.argmax(scores, axis=2)                       # (B, P)
    # conf = the max score — NOT take_along_axis(scores, cls): that gather
    # measured 2.7 ms alone at batch 128 (XLA:TPU lowers large gathers
    # element-wise); the max reduce is equivalent and ~free
    conf = jnp.max(scores, axis=2)
    valid = (conf > p["confidence_threshold"]) & (cls != 0)

    offset = 0 if p["normalized"] else 1

    def decode_one(pb, lg, vr):
        return _decode(jnp, pb[:, offset:offset + 4], lg, vr, p)

    decoded = jax.vmap(decode_one)(boxes_p, logits, boxes_v)  # (B, P, 4)
    if p["clip_before_nms"]:
        decoded = jnp.clip(decoded, 0.0, 1.0)

    # output geometry is defined by the FULL prior count (infer_shapes and
    # the numpy/jax twins use it) — fix it before the compaction below
    # rebinds P to the candidate count
    out_shape = _output_shape(p, P)

    # spec top_k pre-NMS (see _top_k_prefilter_np): compact the top-k
    # candidates per example and suppress only those — exact for every
    # surviving record, and the pair count drops P²→top_k² (1917²→100²
    # for SSD-MobileNet: measured 5.9 ms → sub-ms of the b256 step)
    if 0 < p["top_k"] < P:
        M = p["top_k"]
        conf, cand = jax.lax.top_k(
            jnp.where(valid, conf, -jnp.inf), M)           # (B, M) desc
        valid = conf > p["confidence_threshold"]           # -inf rows drop
        cls = jnp.take_along_axis(cls, cand, axis=1)
        decoded = jnp.take_along_axis(decoded, cand[..., None], axis=1)
        P = M

    # --- tiled batched suppression ---
    PP = ((P + row_tile - 1) // row_tile) * row_tile
    dec_pad = jnp.pad(decoded, ((0, 0), (0, PP - P), (0, 0)))
    conf_pad = jnp.pad(conf, ((0, 0), (0, PP - P)),
                       constant_values=-jnp.inf)
    idx = jnp.arange(P)

    area_all = (decoded[..., 2] - decoded[..., 0]) * (
        decoded[..., 3] - decoded[..., 1])                 # (B, P)

    def tile_step(_, r0):
        rows = jax.lax.dynamic_slice(
            dec_pad, (0, r0, 0), (B, row_tile, 4))         # (B, T, 4)
        conf_rows = jax.lax.dynamic_slice(
            conf_pad, (0, r0), (B, row_tile))              # (B, T)
        x0 = jnp.maximum(rows[..., 0:1], decoded[..., None, :, 0])
        y0 = jnp.maximum(rows[..., 1:2], decoded[..., None, :, 1])
        x1 = jnp.minimum(rows[..., 2:3], decoded[..., None, :, 2])
        y1 = jnp.minimum(rows[..., 3:4], decoded[..., None, :, 3])
        # max(w,0)*max(h,0) == where((w<0)|(h<0), 0, w*h) with fewer ops,
        # and `inter > thr*union` avoids the per-pair divide (multi-cycle
        # on the VPU; union > 0 whenever inter can exceed the threshold)
        inter = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
        area_r = (rows[..., 2] - rows[..., 0]) * (rows[..., 3] - rows[..., 1])
        union = area_r[..., None] + area_all[:, None, :] - inter
        row_ids = r0 + jnp.arange(row_tile)
        j_less = idx[None, :] < row_ids[:, None]           # (T, P)
        beats = (conf[:, None, :] > conf_rows[..., None]) | (
            (conf[:, None, :] == conf_rows[..., None]) & j_less[None]
        )
        # union > 0 guard: a half-inverted decoded box has NEGATIVE area,
        # so inter=0 > thr·union would spuriously register as overlap —
        # the ref twin's inter/union gives -0.0/NaN there, i.e. no
        # overlap (found by differential fuzzing with CORNER decode)
        overlap = (
            (inter > p["nms_threshold"] * union)
            & (union > 0)
            & (idx[None, None, :] != row_ids[None, :, None])
        )
        kill = jnp.any(overlap & beats & valid[:, None, :], axis=2)
        return None, kill                                  # (B, T)

    _, kills = jax.lax.scan(
        tile_step, None, jnp.arange(0, PP, row_tile))      # (nt, B, T)
    kill = jnp.transpose(kills, (1, 0, 2)).reshape(B, PP)[:, :P]
    keep = valid & ~kill

    if p["clip_after_nms"]:
        decoded = jnp.clip(decoded, 0.0, 1.0)

    max_record = out_shape[2]  # out_shape fixed pre-compaction (full P)
    num_keep = keep.sum(axis=1)                            # (B,)

    # top-K by confidence instead of a full argsort: lax.top_k breaks ties
    # by lower index, matching the reference's stable high->low ordering
    # (DetectionOutput.py:245), at a fraction of the sort cost
    k = min(max_record, P)
    top_conf, top = jax.lax.top_k(
        jnp.where(keep, conf, -jnp.inf), k)                # (B, k) each
    rank = jnp.arange(k)
    is_det = rank[None, :] < jnp.minimum(num_keep, k)[:, None]
    is_term = rank[None, :] == num_keep[:, None]

    dec_top = jnp.take_along_axis(decoded, top[..., None], axis=1)
    records = jnp.stack(
        [
            jnp.broadcast_to(rank[None, :], (B, k)).astype(jnp.float32),
            jnp.take_along_axis(cls, top, axis=1).astype(jnp.float32),
            top_conf.astype(jnp.float32),
            dec_top[..., 0], dec_top[..., 1],
            dec_top[..., 2], dec_top[..., 3],
        ],
        axis=2,
    )                                                      # (B, k, 7)
    term = jnp.concatenate(
        [jnp.full((k, 1), -1.0), jnp.zeros((k, 6))], axis=1
    )
    out = jnp.where(
        is_det[..., None], records,
        jnp.where(is_term[..., None], term[None], 0.0),
    )
    if k < max_record:
        pad = jnp.zeros((B, max_record - k, 7), jnp.float32)
        # terminator may land beyond the top-k block when num_keep == k
        term_row = (jnp.arange(k, max_record)[None, :]
                    == num_keep[:, None]).astype(jnp.float32)
        pad = pad.at[..., 0].set(-term_row)
        out = jnp.concatenate([out, pad], axis=1)
    return out.reshape((B,) + out_shape).astype(jnp.float32)


@register
class DetectionOutput(Op):
    type_name = "DetectionOutput"

    @staticmethod
    def _baked_batch(node) -> int:
        """Batch carried IN the graph shapes — stamped explicitly by
        bake_batch (passes/shape_infer.py) so a spec-conformant batch-N
        IR (declared (1, 1, N·K, 7) output) is never misread as baked."""
        return int(node.attrs.get("_baked_batch", 1))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        p = _do_params(node)
        prior_box_size = 4 if p["normalized"] else 5
        P = in_shapes[2][2] // prior_box_size
        out = _output_shape(p, P)
        n = self._baked_batch(node)
        if n > 1:
            # batch-baked graph: per-example record tables stacked on the
            # leading axis with the declared unit batch collapsed — the
            # same layout infer_batch returns for the vmap path
            out = (n,) + out[1:]
        return ShapeResult({node.out_port: out})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        p = _do_params(node)
        n = self._baked_batch(node)
        if n > 1:
            rows = [detection_output_ref(
                inputs[0][i:i + 1], inputs[1][i:i + 1], inputs[2], p)
                for i in range(n)]
            return {node.out_port: np.concatenate(
                [r.reshape((1,) + r.shape[1:]) for r in rows])}
        out = detection_output_ref(inputs[0], inputs[1], inputs[2], p)
        return {node.out_port: out}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        p = _do_params(node)
        loc = inputs[0].nchw()
        conf = inputs[1].nchw()
        prop = inputs[2].nchw()
        n = self._baked_batch(node)
        if n > 1:
            # batch-baked: run the row-tiled batched pass directly (no
            # custom_vmap wrapper — there is no vmap to catch)
            prop_b = jnp.broadcast_to(prop[None], (n,) + prop.shape)
            out = detection_output_jax_batched(loc, conf, prop_b, p)
            out = out.reshape((n,) + out.shape[2:])
            return {node.out_port: TValue(out, "L")}
        fn = _batched_do(tuple(sorted(p.items())))
        out = fn(loc, conf, prop)
        return {node.out_port: TValue(out, "L")}


import functools  # noqa: E402


@functools.lru_cache(maxsize=None)
def _batched_do(p_items):
    """custom_vmap wrapper: under the compiler's batch-N vmap, run the whole
    batch through ONE tiled suppression pass (detection_output_jax_batched)
    instead of lifting the P×P formulation — a naive lift materializes
    batch × 1917² × 3 suppression masks (tens of GB) at once, while round
    1's sequential lax.map serialized the postprocess tail (2.1 ms of the
    SSD batch-32 step).  The row-tiled scan bounds peak memory at
    B·tile·P while keeping every example in flight."""
    import jax
    import jax.numpy as jnp

    p = dict(p_items)

    @jax.custom_batching.custom_vmap
    def fn(box_logits, class_pred, proposals):
        return detection_output_jax(box_logits, class_pred, proposals, p)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = [
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        return detection_output_jax_batched(*full, p), True

    return fn
