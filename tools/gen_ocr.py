"""Programmatic OCR-style sequence model in OpenVINO IR v10 — the
sixteenth family, and the first built on TensorIterator.

This is the graph shape OpenVINO's Model Optimizer actually emits for
TF/ONNX sequence models (the pipeline the reference documents,
reference: convert-model.sh:1-12): a TensorIterator layer whose <body>
holds a single recurrent cell, iterated over the time axis with back
edges carrying (H, C) — NOT the post-opset-fused LSTMSequence form
(that is the lstm-tiny family, tools/gen_lstm.py).  The reference
engine dies on such an IR (inference_engine.py:270-272).

Topology over a (1, T=24, F=32) feature strip (text-line OCR style):

    forward  TensorIterator[LSTMCell(H=48)]   # (1,24,48)
    reverse  TensorIterator[LSTMCell(H=48)]   # (1,24,48)  (stride -1)
    -> Concat axis=2                          # (1,24,96)
    -> per-frame FC(27) + transpose           # (1,27,24)
    -> SoftMax axis=1                         # per-frame class posteriors

27 classes = 26 letters + CTC blank.  The per-frame posterior output is
scored like a segmentation map (per-frame argmax agreement,
tools/accuracy.py score_seg).

Compiled-path story: each TI is ONE lax.scan whose body is the fico
LSTMCell math (ops/subgraph.py, ops/recurrent.py), the reverse direction
is the same scan over flipped chunks, and the body weights live in the
device pytree under sub.* keys.

The harness feeds 0..255 feature blobs (tools/accuracy.py eval_images);
the 1/255 input scale is folded into the cells' input projections W,
like every programmatic family folds it into conv1.

Usage:
    python tools/gen_ocr.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402

# Bump when the topology/weight synthesis changes so the cached
# assets/ocr-ti.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

_T = 24       # frames (text-line width steps)
_F = 32       # features per frame
_H = 48       # LSTM hidden size per direction
_CLASSES = 27  # 26 letters + CTC blank


def _cell_weights(rng, in_dim, hidden, in_scale=1.0):
    """fico-ordered W:[4H,I], R:[4H,H], B:[4H]; ``in_scale`` folds the
    0..255 input normalization into the input projection."""
    w = (rng.standard_normal((4 * hidden, in_dim))
         * np.sqrt(1.0 / in_dim) * in_scale).astype(np.float32)
    r = (rng.standard_normal((4 * hidden, hidden))
         * np.sqrt(1.0 / hidden)).astype(np.float32)
    bias = (rng.standard_normal(4 * hidden) * 0.05).astype(np.float32)
    bias[:hidden] += 1.0  # forget-gate bias (fico order)
    return w, r, bias


def _lstm_cell_body(name, W, R, B, hidden):
    """TI body: x_t (1,1,F) sliced frame + carried (h, c) → LSTMCell."""
    bb = GraphBuilder(name)
    xt = bb.parameter("x_t", (1, 1, W.shape[1]))
    h = bb.parameter("h_in", (1, hidden))
    c = bb.parameter("c_in", (1, hidden))
    xf = bb.reshape(xt, (1, W.shape[1]))
    ho, co = bb._add_node(
        "LSTMCell", [xf, h, c, bb.const(W), bb.const(R), bb.const(B)],
        {"hidden_size": hidden})
    bb.result(ho, "h_out")
    bb.result(co, "c_out")
    bb.result(bb.reshape(ho, (1, 1, hidden)), "y_out")
    return bb.build()


def build_ocr(num_classes: int = _CLASSES, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("ocr_ti")
    x = b.parameter("data", (1, _T, _F))

    ys = []
    for direction in ("fwd", "bwd"):
        W, R, B = _cell_weights(rng, _F, _H, in_scale=1.0 / 255.0)
        body = _lstm_cell_body(f"cell_{direction}", W, R, B, _H)
        sl = ({"axis": 1} if direction == "fwd"
              else {"axis": 1, "start": -1, "end": 0, "stride": -1})
        h0 = b.const(np.zeros((1, _H), np.float32), f"h0_{direction}")
        c0 = b.const(np.zeros((1, _H), np.float32), f"c0_{direction}")
        y = b.tensor_iterator(
            [x, h0, c0], body,
            input_map=[("x_t", sl), "h_in", "c_in"],
            output_map=[("y_out", sl)],
            back_edges=[("h_out", "h_in"), ("c_out", "c_in")],
            name=f"ti_{direction}")
        ys.append(y)

    cat = b.concat(ys, axis=2)                      # (1, T, 2H)
    flat = b.reshape(cat, (_T, 2 * _H))
    w_out = (rng.standard_normal((2 * _H, num_classes))
             * np.sqrt(1.0 / (2 * _H))).astype(np.float32)
    b_out = (rng.standard_normal((1, num_classes)) * 0.05).astype(np.float32)
    logits = b.add(b.matmul(flat, b.const(w_out)), b.const(b_out))
    frames = b.transpose(b.reshape(logits, (1, _T, num_classes)),
                         (0, 2, 1))                 # (1, C, T)
    b.result(b.softmax(frames, axis=1), name="probs")
    return b.build()


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "ocr-ti.xml"
    write_ir_model(build_ocr(), out)
    print(f"wrote {out} (+ .bin)")


if __name__ == "__main__":
    main()
