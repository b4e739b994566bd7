"""Programmatic tiny-YOLO-v2 detector in OpenVINO IR v10 — the
fourteenth model family, and the first RegionYolo one.

The classic OMZ yolo-v2-tiny pipeline shape, scaled to a 160×160 input:
conv/leaky(PReLU)/maxpool trunk down to a 5×5 stride-32 grid — including
the famous stride-1 'same' 2×2 MaxPool before the final convs — then a
1×1 head and the RegionYolo region activation (ops/yolo.py: logistic on
x/y/objectness, per-anchor class softmax, flattened v2 output layout).
Box decode is host-side (pyopenvino_tpu/metrics.py decode_region_yolo),
exactly like the OMZ demos.  The reference engine has none of this (no
RegionYolo plugin, no PReLU — a YOLO IR dies at
inference_engine.py:270-272).

Weight synthesis is margin-aware like tools/gen_weights.py: objectness
biases sit at ≈−2.2 so a random input fires a sparse, realistic set of
cells instead of saturating every anchor.

Usage:
    python tools/gen_yolo.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402

# Bump when the topology/weight synthesis changes so the cached
# assets/yolo-tiny.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 2

IMG = 160
GRID = 5
CLASSES = 4
COORDS = 4
# (aw, ah) in grid units — the decoder reads these back from the IR attr
ANCHORS = ((0.6, 0.8), (1.2, 1.2), (2.0, 1.5), (1.5, 2.4), (3.2, 3.0))
NUM = len(ANCHORS)


def build_yolo_tiny():
    rng = np.random.default_rng(20260820)

    def he(shape, fan_in, scale=1.0):
        return (rng.standard_normal(shape)
                * np.sqrt(2.0 / fan_in) * scale).astype(np.float32)

    b = GraphBuilder("yolo-tiny")
    x = b.parameter("data", (1, 3, IMG, IMG))

    def block(y, ci, co, name, pool_stride=2):
        w = he((co, ci, 3, 3), ci * 9)
        if name == "c1":
            w = w / 255.0  # MO --scale 255 folded into conv1
        y = b.conv2d(y, b.const(w, f"{name}_w"), pads=((1, 1), (1, 1)))
        y = b.add(y, b.const(
            rng.uniform(-0.05, 0.05, (1, co, 1, 1)).astype(np.float32),
            f"{name}_b"))
        y = b.prelu(y, 0.1, name=f"{name}_lrelu")
        if pool_stride == 2:
            y = b.max_pool(y, name=f"{name}_pool")
        elif pool_stride == 1:  # the yolo-v2-tiny stride-1 'same' pool
            y = b.max_pool(y, kernel=(2, 2), strides=(1, 1),
                           pads=((0, 1), (0, 1)), name=f"{name}_pool1")
        return y

    y = block(x, 3, 16, "c1")
    y = block(y, 16, 32, "c2")
    y = block(y, 32, 64, "c3")
    y = block(y, 64, 128, "c4")
    y = block(y, 128, 256, "c5")
    y = block(y, 256, 256, "c6", pool_stride=1)
    y = block(y, 256, 256, "c7", pool_stride=0)

    co = NUM * (COORDS + 1 + CLASSES)
    head_w = he((co, 256, 1, 1), 256, scale=0.6)
    head_b = np.zeros((1, co, 1, 1), np.float32)
    block_sz = COORDS + 1 + CLASSES
    for a in range(NUM):
        # margin-aware head: strong objectness/class logit variance with a
        # negative obj bias — a random input fires a sparse handful of
        # cells above the demo threshold instead of all 125 or none
        head_w[a * block_sz + COORDS] *= 4.5
        head_b[0, a * block_sz + COORDS, 0, 0] = -2.0
        cls_rows = slice(a * block_sz + COORDS + 1, (a + 1) * block_sz)
        head_w[cls_rows] *= 3.0
    y = b.conv2d(y, b.const(head_w, "head_w"))
    y = b.add(y, b.const(head_b, "head_b"))
    region = b.region_yolo(
        y, classes=CLASSES, num=NUM,
        anchors=[v for a in ANCHORS for v in a], coords=COORDS,
        do_softmax=True, name="region")
    b.result(region, name="yolo_out")
    return b.build()


def append_yolo_decode(b, region, grid_hw, anchors, classes, coords=4,
                       max_out=12, iou_threshold=0.45,
                       score_threshold=0.25):
    """On-device YOLO-v2 box decode + NMS as a fixed-shape masked graph
    composition — the DetectionOutput standard
    (reference: op_plugins/DetectionOutput.py:162-260 → ops/ssd.py)
    applied to the region head, replacing the OMZ demos' host-side
    numpy decode (pyopenvino_tpu/metrics.py decode_region_yolo).

    From the RegionYolo do_softmax blob: VariadicSplit the per-anchor
    block into x/y/wh/obj/class channels, add the grid offsets, exp the
    sizes against the anchor priors, corner-ize, then NonMaxSuppression
    (ops/nms.py, padded static shapes) and gather the kept boxes into a
    (max_out·classes, 7) DetectionOutput-style record table
    [img, class, conf, x0, y0, x1, y1] with -1 padding rows.

    Returns the records Port."""
    h, w = (int(d) for d in grid_hw)
    na = len(anchors)
    block = coords + 1 + classes
    t = b.reshape(region, (na, block, h, w))
    xch, ych, wch, hch, obj, cls = b.variadic_split(
        t, 1, [1, 1, 1, coords - 3, 1, classes])

    xs = np.tile(np.arange(w, dtype=np.float32), (h, 1)).reshape(
        1, 1, h, w)
    ys = np.repeat(np.arange(h, dtype=np.float32), w).reshape(1, 1, h, w)
    aw = np.asarray([a[0] for a in anchors], np.float32).reshape(
        na, 1, 1, 1) / w
    ah = np.asarray([a[1] for a in anchors], np.float32).reshape(
        na, 1, 1, 1) / h
    inv_w = np.float32(1.0 / w).reshape(())
    inv_h = np.float32(1.0 / h).reshape(())
    half = b.const(np.float32(0.5).reshape(()), "half")

    bx = b.multiply(b.add(xch, b.const(xs, "grid_x")), b.const(inv_w))
    by = b.multiply(b.add(ych, b.const(ys, "grid_y")), b.const(inv_h))
    bw = b.multiply(b.exp(wch), b.const(aw, "anch_w"))
    bh = b.multiply(b.exp(hch), b.const(ah, "anch_h"))
    x0 = b.subtract(bx, b.multiply(bw, half))
    y0 = b.subtract(by, b.multiply(bh, half))
    x1 = b.add(bx, b.multiply(bw, half))
    y1 = b.add(by, b.multiply(bh, half))
    # (na, 4, h, w) → (1, na·h·w, 4) candidate boxes
    corners = b.concat([x0, y0, x1, y1], axis=1)
    boxes = b.reshape(b.transpose(corners, (0, 2, 3, 1)),
                      (1, na * h * w, 4))
    # (na, classes, h, w) → (1, classes, na·h·w) per-class confidences
    conf = b.multiply(obj, cls)
    scores = b.reshape(b.transpose(conf, (1, 0, 2, 3)),
                       (1, classes, na * h * w))
    idx, sel, _valid = b.non_max_suppression(
        boxes, scores, max_boxes=max_out, iou_threshold=iou_threshold,
        score_threshold=score_threshold, sort_result_descending=True)

    # records: sel already carries [img, class, conf] with -1 pad rows;
    # gather the kept corner rows by box index (clamped — pad rows point
    # at row 0) and zero them behind the -1 mask
    box_rows = b.reshape(boxes, (na * h * w, 4))
    picked = b.gather(idx, [2], axis=1)                   # (S, 1)
    safe = b.maximum(picked, b.const(np.zeros((1, 1), np.int32)))
    sel_boxes = b.gather(box_rows, b.reshape(safe, (-1,)), axis=0)
    live = b.convert(
        b.compare("GreaterEqual", b.gather(sel, [0], axis=1),
                  b.const(np.zeros((1, 1), np.float32))), "f32")
    return b.concat([sel, b.multiply(sel_boxes, live)], axis=1)


def build_yolo_v2(seed: int = 20260820):
    """Seventeenth family: full YOLO-v2 shape — the ReorgYolo passthrough
    skip (darknet's famous reorg, ops/yolo.py) concatenated into the
    head, RegionYolo, and the WHOLE box decode + NMS on device
    (append_yolo_decode): `detections` is a DetectionOutput-style record
    table, zero host-side postprocessing."""
    rng = np.random.default_rng(seed)

    def he(shape, fan_in, scale=1.0):
        return (rng.standard_normal(shape)
                * np.sqrt(2.0 / fan_in) * scale).astype(np.float32)

    b = GraphBuilder("yolo-v2")
    x = b.parameter("data", (1, 3, IMG, IMG))

    def block(y, ci, co, name, pool_stride=2):
        w = he((co, ci, 3, 3), ci * 9)
        if name == "c1":
            w = w / 255.0  # MO --scale 255 folded into conv1
        y = b.conv2d(y, b.const(w, f"{name}_w"), pads=((1, 1), (1, 1)))
        y = b.add(y, b.const(
            rng.uniform(-0.05, 0.05, (1, co, 1, 1)).astype(np.float32),
            f"{name}_b"))
        y = b.prelu(y, 0.1, name=f"{name}_lrelu")
        if pool_stride == 2:
            y = b.max_pool(y, name=f"{name}_pool")
        return y

    y = block(x, 3, 16, "c1")
    y = block(y, 16, 32, "c2")
    y = block(y, 32, 64, "c3")
    y = block(y, 64, 128, "c4")          # (128, 10, 10) — skip source
    skip = y
    y = block(y, 128, 256, "c5")         # (256, 5, 5)
    y = block(y, 256, 256, "c6", pool_stride=0)
    # the yolo-v2 passthrough: reorg the higher-resolution feature and
    # concatenate with the deep trunk (darknet route+reorg)
    re = b.reorg_yolo(skip, stride=2, name="reorg")   # (512, 5, 5)
    y = b.concat([re, y], axis=1)                      # (768, 5, 5)
    fuse_w = he((256, 768, 1, 1), 768)
    y = b.conv2d(y, b.const(fuse_w, "fuse_w"))
    y = b.prelu(y, 0.1, name="fuse_lrelu")

    co = NUM * (COORDS + 1 + CLASSES)
    head_w = he((co, 256, 1, 1), 256, scale=0.6)
    head_b = np.zeros((1, co, 1, 1), np.float32)
    block_sz = COORDS + 1 + CLASSES
    for a in range(NUM):
        head_w[a * block_sz + COORDS] *= 4.5
        head_b[0, a * block_sz + COORDS, 0, 0] = -2.0
        cls_rows = slice(a * block_sz + COORDS + 1, (a + 1) * block_sz)
        head_w[cls_rows] *= 3.0
    y = b.conv2d(y, b.const(head_w, "head_w"))
    y = b.add(y, b.const(head_b, "head_b"))
    region = b.region_yolo(
        y, classes=CLASSES, num=NUM,
        anchors=[v for a in ANCHORS for v in a], coords=COORDS,
        do_softmax=True, name="region")
    records = append_yolo_decode(
        b, region, (GRID, GRID), ANCHORS, CLASSES,
        max_out=12, iou_threshold=0.45, score_threshold=0.25)
    b.result(records, name="detections")
    return b.build()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "yolo-tiny.xml"
    if "--v2" in sys.argv:
        out = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "--v2" \
            else "yolo-v2.xml"
        write_ir_model(build_yolo_v2(), out)
    else:
        write_ir_model(build_yolo_tiny(), out)
    print("wrote", out)
