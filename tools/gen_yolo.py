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


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "yolo-tiny.xml"
    write_ir_model(build_yolo_tiny(), out)
    print("wrote", out)
