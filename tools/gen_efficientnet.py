"""Programmatic EfficientNet-B0-style classifier — the eighth model
family, and the capstone for the extension op set.

MBConv blocks (1×1 expand → k×k depthwise → Squeeze-and-Excitation →
1×1 linear project, identity residual at stride 1) with Swish
activations throughout, 5×5 depthwise stages, and SE gates built from
ReduceMean(keep_dims) → 1×1 → Swish → 1×1 → Sigmoid → Multiply — none
of which exist in the reference op set (ops/extended.py).  BatchNorm is
folded into conv weights at build time, 1/255 input scale folded into
the stem (reference: convert-model.sh:8-13), matching the other
programmatic families.

Usage:
    python tools/gen_efficientnet.py out.xml    # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when topology/weight synthesis changes so cached
# assets/efficientnet-b0.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

# B0: (expansion t, out channels c, repeats n, first stride s, kernel k)
_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _conv(b, rng, x, co, k, stride, act=True, in_scale=1.0):
    """Folded-BN conv + bias, optionally Swish-activated."""
    ci = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (co, ci, k, k)).astype(
        np.float32) * in_scale
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    pad = k // 2
    out = b.conv2d(x, b.const(w), strides=(stride, stride),
                   pads=((pad, pad), (pad, pad)))
    out = b.add(out, b.const(bias))
    return b.swish(out) if act else out


def _depthwise(b, rng, x, k, stride):
    c = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / (k * k)), (c, 1, 1, k, k)).astype(
        np.float32)
    bias = rng.normal(0, 0.02, (1, c, 1, 1)).astype(np.float32)
    out = b.group_conv2d(x, b.const(w), strides=(stride, stride),
                         pads=((k // 2,) * 2,) * 2)
    return b.swish(b.add(out, b.const(bias)))


def _se(b, rng, x, se_ch):
    """Squeeze-and-Excitation gate (ratio vs the block's input width)."""
    c = x.shape[1]
    s = b.reduce("mean", x, (2, 3), keep_dims=True)
    w1 = rng.normal(0, np.sqrt(2.0 / c), (se_ch, c, 1, 1)).astype(np.float32)
    s = b.swish(b.conv2d(s, b.const(w1)))
    w2 = rng.normal(0, np.sqrt(2.0 / se_ch), (c, se_ch, 1, 1)).astype(
        np.float32)
    gate = b.sigmoid(b.conv2d(s, b.const(w2)))
    return b.multiply(x, gate)


def _mbconv(b, rng, x, t, co, stride, k):
    """Expand → depthwise → SE → linear project (+ identity residual).
    The project conv is down-scaled (folded-γ effect) so activation
    variance stays bounded through 16 blocks."""
    ci = x.shape[1]
    y = x if t == 1 else _conv(b, rng, x, ci * t, 1, 1)
    y = _depthwise(b, rng, y, k, stride)
    y = _se(b, rng, y, max(1, ci // 4))
    y = _conv(b, rng, y, co, 1, 1, act=False, in_scale=0.6)
    return b.add(y, x) if (stride == 1 and ci == co) else y


def build_efficientnet_b0(num_classes: int = 1000, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("efficientnet-b0")
    x = b.parameter("data", (1, 3, 224, 224))

    x = _conv(b, rng, x, 32, 3, 2, in_scale=1.0 / 255.0)     # 112²

    for t, c, n, s, k in _BLOCKS:
        for i in range(n):
            x = _mbconv(b, rng, x, t, c, s if i == 0 else 1, k)

    x = _conv(b, rng, x, 1280, 1, 1)                          # 7²
    x = b.reduce("mean", x, (2, 3), keep_dims=False)          # (1, 1280)
    wf = (8.0 * rng.normal(0, np.sqrt(1.0 / 1280),
                           (1280, num_classes))).astype(np.float32)
    # Hot-bias ladder (the gen_shufflenet/gen_weights convention): random
    # deep nets + GAP leave near-tied top classes whose ordering flips
    # under int8 rounding; a decaying bias ladder makes the ranking
    # quantization-robust so the agreement gates measure the engine.
    bf = rng.normal(0, 0.002, (1, num_classes)).astype(np.float32)
    hot = rng.choice(num_classes, 4, replace=False)
    bf[0, hot] += np.array([8.0, 6.0, 4.5, 3.5], np.float32)
    x = b.add(b.matmul(x, b.const(wf)), b.const(bf))
    b.result(b.softmax(x, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "efficientnet-b0.xml"
    model = build_efficientnet_b0()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
