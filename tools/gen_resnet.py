"""Programmatic ResNet-18 in OpenVINO IR v10 — the fifth model family.

The reference ships exactly four fixed XMLs; this builds a classic
residual topology (basic blocks, stride-2 downsample shortcuts, global
average pool, fc head) straight through the GraphBuilder and serializes
it with ir/writer.py, proving the engine is not overfit to the shipped
model files: residual adds, 1×1 projection shortcuts and a 7×7 global
pool all flow through the same parser/passes/compiler path.

BatchNorm is folded into the conv weights at build time (the same
convention as the reference's converted models — convert-model.sh folds
preprocessing; OpenVINO's optimizer folds BN), so blocks are
Conv→Add(bias)→ReLU chains the fusion pass collapses.  Weights are
seeded He-init with a 1/255 input scale folded into conv1
(reference: convert-model.sh:8-13 does the same for its models).

Usage:
    python tools/gen_resnet.py out.xml            # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/resnet18.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1


def _conv_bn_relu(b, rng, x, co, k, stride, relu=True, in_scale=1.0):
    """Conv with folded-BN weights + bias + optional ReLU."""
    ci = x.shape[1]
    fan_in = ci * k * k
    w = rng.normal(0, np.sqrt(2.0 / fan_in), (co, ci, k, k)).astype(
        np.float32) * in_scale
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    pad = k // 2
    out = b.conv2d(x, b.const(w), strides=(stride, stride),
                   pads=((pad, pad), (pad, pad)))
    out = b.add(out, b.const(bias))
    return b.relu(out) if relu else out


def _basic_block(b, rng, x, co, stride):
    """Two 3×3 convs + identity/projection shortcut (He/ResNet-18).

    The residual branch's second conv is down-scaled (the effect a
    trained BN's γ would have) so activation variance stays bounded
    through 8 blocks and the synthetic head produces margin-bearing,
    non-saturated class scores."""
    y = _conv_bn_relu(b, rng, x, co, 3, stride)
    y = _conv_bn_relu(b, rng, y, co, 3, 1, relu=False, in_scale=0.4)
    if stride != 1 or x.shape[1] != co:
        x = _conv_bn_relu(b, rng, x, co, 1, stride, relu=False)
    return b.relu(b.add(y, x))


def build_resnet18(num_classes: int = 1000, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("resnet18")
    x = b.parameter("data", (1, 3, 224, 224))

    # stem: 7×7/2 (1/255 input scale folded in) + 3×3/2 maxpool
    x = _conv_bn_relu(b, rng, x, 64, 7, 2, in_scale=1.0 / 255.0)
    x = b.max_pool(x, kernel=(3, 3), strides=(2, 2), pads=((1, 1), (1, 1)))

    for co, stride in [(64, 1), (64, 1), (128, 2), (128, 1),
                       (256, 2), (256, 1), (512, 2), (512, 1)]:
        x = _basic_block(b, rng, x, co, stride)

    # global average pool (7×7 → 1×1), flatten, fc, softmax
    x = b.avg_pool(x, kernel=(7, 7), strides=(1, 1))
    x = b.reshape(x, (1, 512))
    wf = (0.5 * rng.normal(0, np.sqrt(1.0 / 512), (512, num_classes))
          ).astype(np.float32)
    bf = rng.normal(0, 0.01, (1, num_classes)).astype(np.float32)
    x = b.add(b.matmul(x, b.const(wf)), b.const(bf))
    b.result(b.softmax(x, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "resnet18.xml"
    model = build_resnet18()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
