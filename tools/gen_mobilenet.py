"""Programmatic MobileNet-v2 in OpenVINO IR v10 — the sixth model family.

ResNet-18 (tools/gen_resnet.py) proved residual topologies; this one
proves the *depthwise* classifier shapes none of the shipped XMLs
exercise together: inverted-residual blocks (1×1 expand → 3×3 depthwise
→ 1×1 linear project), ReLU6 activations (Clamp, the op the reference
uses only inside SSD-MobileNet — op_plugins/Clamp.py), stride-2
depthwise stages, and identity residual adds around *linear* (activation
-free) bottlenecks — a fusion pattern (Conv→Add with no trailing
activation feeding an elementwise Add) distinct from ResNet's
Conv→Add→ReLU blocks.  It is also the first classifier to route the
INT8-FULL inter-layer dataflow through depthwise convs end-to-end.

BatchNorm is folded into conv weights at build time (the convention of
the reference's converted models — convert-model.sh folds preprocessing,
OpenVINO's optimizer folds BN), weights are He-seeded with a 1/255 input
scale folded into the stem conv (reference: convert-model.sh:8-13), and
the project convs are down-scaled (a trained γ's effect) so activation
variance stays bounded through 17 blocks and the head produces
margin-bearing class scores.

Usage:
    python tools/gen_mobilenet.py out.xml        # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/mobilenet-v2.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

# (expansion t, out channels c, repeats n, first stride s) — the v2 paper's
# table 2 at width 1.0, input 224².
_BLOCKS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def _conv(b, rng, x, co, k, stride, relu6, in_scale=1.0):
    """Folded-BN conv + bias, optionally capped with ReLU6 (Clamp 0..6)."""
    ci = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (co, ci, k, k)).astype(
        np.float32) * in_scale
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    pad = k // 2
    out = b.conv2d(x, b.const(w), strides=(stride, stride),
                   pads=((pad, pad), (pad, pad)))
    out = b.add(out, b.const(bias))
    return b.clamp(out, 0.0, 6.0) if relu6 else out


def _depthwise(b, rng, x, stride):
    """3×3 depthwise conv + bias + ReLU6; weight layout (G,1,1,3,3)."""
    c = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / 9.0), (c, 1, 1, 3, 3)).astype(np.float32)
    bias = rng.normal(0, 0.02, (1, c, 1, 1)).astype(np.float32)
    out = b.group_conv2d(x, b.const(w), strides=(stride, stride),
                         pads=((1, 1), (1, 1)))
    out = b.add(out, b.const(bias))
    return b.clamp(out, 0.0, 6.0)


def _inverted_residual(b, rng, x, t, co, stride):
    """1×1 expand (ReLU6) → 3×3 depthwise (ReLU6) → 1×1 linear project,
    with an identity residual when shapes allow (stride 1, ci == co)."""
    ci = x.shape[1]
    y = x if t == 1 else _conv(b, rng, x, ci * t, 1, 1, relu6=True)
    y = _depthwise(b, rng, y, stride)
    y = _conv(b, rng, y, co, 1, 1, relu6=False, in_scale=0.55)
    return b.add(y, x) if (stride == 1 and ci == co) else y


def build_mobilenet_v2(num_classes: int = 1000, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("mobilenet-v2")
    x = b.parameter("data", (1, 3, 224, 224))

    # stem: 3×3/2 → 32 channels, 1/255 input scale folded in
    x = _conv(b, rng, x, 32, 3, 2, relu6=True, in_scale=1.0 / 255.0)

    for t, c, n, s in _BLOCKS:
        for i in range(n):
            x = _inverted_residual(b, rng, x, t, c, s if i == 0 else 1)

    # head: 1×1 → 1280, global average pool (7×7), fc, softmax
    x = _conv(b, rng, x, 1280, 1, 1, relu6=True)
    x = b.avg_pool(x, kernel=(7, 7), strides=(1, 1))
    x = b.reshape(x, (1, 1280))
    # The fc gain is tuned so synthetic logits carry a stable top-1 margin
    # (flat ~uniform probabilities make int8 ranking tests meaningless).
    wf = (4.0 * rng.normal(0, np.sqrt(1.0 / 1280), (1280, num_classes))
          ).astype(np.float32)
    bf = rng.normal(0, 0.002, (1, num_classes)).astype(np.float32)
    x = b.add(b.matmul(x, b.const(wf)), b.const(bf))
    b.result(b.softmax(x, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "mobilenet-v2.xml"
    model = build_mobilenet_v2()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
