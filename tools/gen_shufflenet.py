"""Programmatic ShuffleNetV2-1.0x in OpenVINO IR v10 — the seventh
model family.

Exercises the graph shapes none of the other six families do: channel
Split (the multi-output op), channel shuffle (rank-5 reshape →
transpose → reshape), dual-branch stride-2 downsample units, and a
global-average-pool head expressed as ReduceMean(axes=(2,3)) — the form
Model Optimizer actually exports — instead of AvgPool.  BatchNorm is
folded into conv weights at build time and a 1/255 input scale is
folded into the stem conv (reference: convert-model.sh:8-13), matching
the other programmatic families (tools/gen_resnet.py,
tools/gen_mobilenet.py).

Usage:
    python tools/gen_shufflenet.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/shufflenet-v2.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

# ShuffleNetV2 1.0x: (out channels, units) per stage, input 224².
_STAGES = [(116, 4), (232, 8), (464, 4)]


def _conv(b, rng, x, co, k, stride, relu=True, in_scale=1.0):
    ci = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (co, ci, k, k)).astype(
        np.float32) * in_scale
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    pad = k // 2
    out = b.conv2d(x, b.const(w), strides=(stride, stride),
                   pads=((pad, pad), (pad, pad)))
    out = b.add(out, b.const(bias))
    return b.relu(out) if relu else out


def _dw(b, rng, x, stride):
    """3×3 depthwise + bias, NO activation (ShuffleNetV2 convention)."""
    c = x.shape[1]
    w = rng.normal(0, np.sqrt(1.0 / 9.0), (c, 1, 1, 3, 3)).astype(np.float32)
    bias = rng.normal(0, 0.02, (1, c, 1, 1)).astype(np.float32)
    out = b.group_conv2d(x, b.const(w), strides=(stride, stride),
                         pads=((1, 1), (1, 1)))
    return b.add(out, b.const(bias))


def _shuffle(b, x, groups=2):
    """Channel shuffle: (1, g, C/g, H, W) → swap g and C/g → flatten."""
    _, c, h, w = x.shape
    s = b.reshape(x, (1, groups, c // groups, h, w))
    s = b.transpose(s, (0, 2, 1, 3, 4))
    return b.reshape(s, (1, c, h, w))


def _basic_unit(b, rng, x):
    """Stride-1 unit: split → (identity ‖ 1×1·dw·1×1) → concat → shuffle.
    The branch's closing 1×1 is down-scaled (folded-γ effect) so
    activation variance stays bounded through 16 units."""
    keep, branch = b.split(x, axis=1, num_splits=2)
    half = x.shape[1] // 2
    y = _conv(b, rng, branch, half, 1, 1)
    y = _dw(b, rng, y, 1)
    y = _conv(b, rng, y, half, 1, 1, in_scale=0.8)
    return _shuffle(b, b.concat([keep, y], axis=1))


def _down_unit(b, rng, x, co):
    """Stride-2 unit: two branches (no split), each emitting co/2."""
    half = co // 2
    left = _dw(b, rng, x, 2)
    left = _conv(b, rng, left, half, 1, 1)
    right = _conv(b, rng, x, half, 1, 1)
    right = _dw(b, rng, right, 2)
    right = _conv(b, rng, right, half, 1, 1)
    return _shuffle(b, b.concat([left, right], axis=1))


def build_shufflenet_v2(num_classes: int = 1000, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("shufflenet-v2")
    x = b.parameter("data", (1, 3, 224, 224))

    x = _conv(b, rng, x, 24, 3, 2, in_scale=1.0 / 255.0)       # 112²
    x = b.max_pool(x, kernel=(3, 3), strides=(2, 2),
                   pads=((1, 1), (1, 1)))                       # 56²

    for co, n in _STAGES:
        x = _down_unit(b, rng, x, co)
        for _ in range(n - 1):
            x = _basic_unit(b, rng, x)

    x = _conv(b, rng, x, 1024, 1, 1)                            # 7²
    x = b.reduce("mean", x, (2, 3), keep_dims=False)            # (1, 1024)
    wf = (8.0 * rng.normal(0, np.sqrt(1.0 / 1024),
                           (1024, num_classes))).astype(np.float32)
    # Hot-bias hierarchy: the 16 shuffle units + GAP leave the pooled
    # feature nearly input-invariant, so random fc rows give near-tied
    # top classes (gap ~0.03 logits — any int8 rounding flips top-1 and
    # poisons the agreement gates).  A decaying bias ladder on a few
    # classes creates a clear, quantization-robust ranking — the same
    # convention tools/gen_weights.py uses for the SSD class heads.
    bf = rng.normal(0, 0.002, (1, num_classes)).astype(np.float32)
    hot = rng.choice(num_classes, 4, replace=False)
    bf[0, hot] += np.array([8.0, 6.0, 4.5, 3.5], np.float32)
    x = b.add(b.matmul(x, b.const(wf)), b.const(bf))
    b.result(b.softmax(x, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "shufflenet-v2.xml"
    model = build_shufflenet_v2()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
