"""Programmatic SqueezeNet-1.1 in OpenVINO IR v10 — the ninth model
family.

Exercises graph shapes none of the other eight families do: Fire
modules (1x1 squeeze -> parallel 1x1/3x3 expand -> Concat), ceil-mode
MaxPool chains, and a fully-convolutional class head — conv10 1x1 to
num_classes + global AvgPool, with no MatMul anywhere in the graph
(every other classifier family ends in a MatMul/ReduceMean head).
BatchNorm-free by construction (SqueezeNet predates BN), so nothing is
folded except the 1/255 input scale into conv1 (reference:
convert-model.sh:8-13), matching the other programmatic families.

Usage:
    python tools/gen_squeezenet.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/squeezenet-1.1.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

# SqueezeNet-1.1 fire ladder: (squeeze, expand) channels per module.
_FIRES = [(16, 64), (16, 64),          # fire2-3   (after pool1)
          (32, 128), (32, 128),        # fire4-5   (after pool3)
          (48, 192), (48, 192),        # fire6-7   (after pool5)
          (64, 256), (64, 256)]        # fire8-9


def _conv(b, rng, x, co, k, stride=1, pad=0, relu=True, in_scale=1.0,
          w_scale=1.0):
    ci = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (co, ci, k, k)).astype(
        np.float32) * (in_scale * w_scale)
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    out = b.conv2d(x, b.const(w), strides=(stride, stride),
                   pads=((pad, pad), (pad, pad)))
    out = b.add(out, b.const(bias))
    return b.relu(out) if relu else out


def _fire(b, rng, x, squeeze, expand):
    """Fire module: 1x1 squeeze -> (1x1 expand || 3x3 expand) -> concat.
    Expand convs are down-scaled so activation variance stays bounded
    through the 8-module ladder (no BN in this architecture)."""
    s = _conv(b, rng, x, squeeze, 1)
    e1 = _conv(b, rng, s, expand, 1, w_scale=0.7)
    e3 = _conv(b, rng, s, expand, 3, pad=1, w_scale=0.7)
    return b.concat([e1, e3], axis=1)


def build_squeezenet_11(num_classes: int = 1000, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("squeezenet-1.1")
    x = b.parameter("data", (1, 3, 224, 224))

    x = _conv(b, rng, x, 64, 3, stride=2, in_scale=1.0 / 255.0)  # 111²
    x = b.max_pool(x, kernel=(3, 3), strides=(2, 2), rounding="ceil")  # 55²

    for i, (sq, ex) in enumerate(_FIRES):
        x = _fire(b, rng, x, sq, ex)
        if i in (1, 3):  # pool after fire3 and fire5 (the 1.1 layout)
            x = b.max_pool(x, kernel=(3, 3), strides=(2, 2),
                           rounding="ceil")                       # 27², 13²

    # Fully-convolutional head: conv10 1x1 -> relu -> global AvgPool.
    ci = x.shape[1]
    w10 = (1.5 * rng.normal(0, np.sqrt(2.0 / ci),
                            (num_classes, ci, 1, 1))).astype(np.float32)
    # Hot-bias ladder (same convention as tools/gen_shufflenet.py):
    # random class rows over a GAP'd feature give near-tied logits that
    # flip under int8 rounding; a decaying bias on a few classes makes
    # the ranking quantization-robust.
    b10 = rng.normal(0, 0.02, (1, num_classes, 1, 1)).astype(np.float32)
    hot = rng.choice(num_classes, 4, replace=False)
    b10[0, hot, 0, 0] += np.array([8.0, 6.0, 4.5, 3.5], np.float32)
    x = b.conv2d(x, b.const(w10))
    x = b.relu(b.add(x, b.const(b10)))
    hw = x.shape[2]
    x = b.avg_pool(x, kernel=(hw, hw), strides=(1, 1))            # (1,C,1,1)
    x = b.reshape(x, (1, num_classes))
    b.result(b.softmax(x, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "squeezenet-1.1.xml"
    model = build_squeezenet_11()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
