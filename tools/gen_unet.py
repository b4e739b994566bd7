"""Programmatic U-Net segmentation model in OpenVINO IR v10 — the
tenth model family, and the first non-classification/detection task.

Exercises graph shapes none of the other nine families do: an
encoder-decoder with ConvolutionBackpropData 2x2/s2 "up-convolutions"
(the MO-exported decoder form), long skip Concats across scales, and a
dense per-pixel softmax head (axis=1 over a rank-4 tensor) — the
reference engine has neither the op nor any segmentation driver.
BatchNorm-free double-conv blocks; a 1/255 input scale is folded into
the stem conv (reference: convert-model.sh:8-13) like the other
programmatic families.

Usage:
    python tools/gen_unet.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/unet.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

_BASE = 16  # channels at full resolution; doubles per level


def _conv(b, rng, x, co, k=3, relu=True, in_scale=1.0, w_scale=1.0):
    ci = x.shape[1]
    w = rng.normal(0, np.sqrt(2.0 / (ci * k * k)), (co, ci, k, k)).astype(
        np.float32) * (in_scale * w_scale)
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    out = b.conv2d(x, b.const(w), pads=((k // 2, k // 2), (k // 2, k // 2)))
    out = b.add(out, b.const(bias))
    return b.relu(out) if relu else out


def _double(b, rng, x, co, in_scale=1.0):
    return _conv(b, rng, _conv(b, rng, x, co, in_scale=in_scale), co)


def _up(b, rng, x, co):
    """2x2/s2 transposed conv — the classic U-Net up-convolution."""
    ci = x.shape[1]
    w = rng.normal(0, np.sqrt(1.0 / ci), (ci, co, 2, 2)).astype(np.float32)
    bias = rng.normal(0, 0.02, (1, co, 1, 1)).astype(np.float32)
    return b.relu(b.add(b.conv_transpose2d(x, b.const(w), strides=(2, 2)),
                        b.const(bias)))


def build_unet(num_classes: int = 8, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("unet")
    x = b.parameter("data", (1, 3, 128, 128))

    e1 = _double(b, rng, x, _BASE, in_scale=1.0 / 255.0)        # 16 @128²
    e2 = _double(b, rng, b.max_pool(e1, (2, 2), (2, 2)), 2 * _BASE)   # 64²
    e3 = _double(b, rng, b.max_pool(e2, (2, 2), (2, 2)), 4 * _BASE)   # 32²
    bott = _double(b, rng, b.max_pool(e3, (2, 2), (2, 2)), 8 * _BASE)  # 16²

    d3 = _double(b, rng, b.concat([_up(b, rng, bott, 4 * _BASE), e3]),
                 4 * _BASE)                                      # 64 @32²
    d2 = _double(b, rng, b.concat([_up(b, rng, d3, 2 * _BASE), e2]),
                 2 * _BASE)                                      # 32 @64²
    d1 = _double(b, rng, b.concat([_up(b, rng, d2, _BASE), e1]),
                 _BASE)                                          # 16 @128²

    # Per-pixel class head.  2.5x head gain gives the argmax map real
    # margins (same motivation as the classifier families' hot-bias
    # ladder — near-tied logits flip under any int8 rounding and poison
    # the pixel-agreement gates; here spatial structure provides the
    # variety, the gain provides the margin).
    logits = _conv(b, rng, d1, num_classes, k=1, relu=False, w_scale=2.5)
    b.result(b.softmax(logits, axis=1), name="mask")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "unet.xml"
    model = build_unet()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
