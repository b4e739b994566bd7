"""Programmatic tiny LSTM sequence classifier in OpenVINO IR v10 — the
thirteenth model family, and the first recurrent one.

Speech-command-style topology over a (1, T=32, F=40) feature matrix:

    bi-LSTMSequence(H=64)             # (1,2,32,64)
    -> transpose/reshape to (1,32,128)
    -> forward LSTMSequence(H=64)     # final hidden state (1,1,64)
    -> FC(30) + SoftMax

Exercises graph shapes no other family does: LSTMSequence in both
directions (one lax.scan per direction with the X·Wᵀ projection hoisted
into a single MXU GEMM — ops/recurrent.py), sequence_lengths masking,
rank-3 dataflow into a rank-2 head, and a Const sequence-lengths input.
The reference engine has no recurrent op at all (pyopenvino/op_plugins/;
a sequence IR dies at inference_engine.py:270-272).

The harness feeds 0..255 feature blobs (tools/accuracy.py eval_images);
the 1/255 input scale is folded into the first layer's W, like every
programmatic family folds it into conv1 (reference: convert-model.sh:8-13).

Usage:
    python tools/gen_lstm.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/lstm-tiny.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

_T = 32       # frames
_F = 40       # features per frame
_H = 64       # hidden size per direction
_CLASSES = 30


def _lstm_weights(rng, in_dim, hidden, scale=1.0):
    """fico-ordered W:[4H,I], R:[4H,H], B:[4H] with a mild forget-gate
    bias (+1, the standard init) so sequences carry state."""
    w = (rng.standard_normal((4 * hidden, in_dim))
         * np.sqrt(1.0 / in_dim) * scale).astype(np.float32)
    r = (rng.standard_normal((4 * hidden, hidden))
         * np.sqrt(1.0 / hidden)).astype(np.float32)
    bias = (rng.standard_normal(4 * hidden) * 0.05).astype(np.float32)
    bias[:hidden] += 1.0  # forget gate first (fico)
    return w, r, bias


def build_lstm(num_classes: int = _CLASSES, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("lstm-tiny")
    x = b.parameter("data", (1, _T, _F))

    lens = b.const(np.full((1,), _T, np.int32), name="seq_lens")
    zeros = np.zeros((1, 2, _H), np.float32)

    # layer 1: bidirectional, with the 1/255 input scale folded into W
    w1f = _lstm_weights(rng, _F, _H, scale=1.0 / 255.0 * 8)
    w1r = _lstm_weights(rng, _F, _H, scale=1.0 / 255.0 * 8)
    y, _, _ = b.lstm_sequence(
        x, b.const(zeros), b.const(zeros), lens,
        b.const(np.stack([w1f[0], w1r[0]])),
        b.const(np.stack([w1f[1], w1r[1]])),
        b.const(np.stack([w1f[2], w1r[2]])),
        _H, direction="bidirectional", name="lstm1",
    )
    # (1,2,T,H) -> (1,T,2,H) -> (1,T,2H): concat directions per frame
    seq = b.reshape(b.transpose(y, (0, 2, 1, 3)), (1, _T, 2 * _H))

    # layer 2: forward; the classifier reads its FINAL hidden state
    w2 = _lstm_weights(rng, 2 * _H, _H)
    zeros1 = np.zeros((1, 1, _H), np.float32)
    _, ho, _ = b.lstm_sequence(
        seq, b.const(zeros1), b.const(zeros1), lens,
        b.const(w2[0][None]), b.const(w2[1][None]), b.const(w2[2][None]),
        _H, direction="forward", name="lstm2",
    )
    feat = b.reshape(ho, (1, _H))

    # Class head with the hot-bias ladder every programmatic family uses
    # (tools/gen_vit.py head comment): real ranking margins so int8
    # rounding can't flip near-tied logits and poison the top-1 gates.
    w = rng.normal(0, np.sqrt(1.0 / _H), (_H, num_classes)).astype(
        np.float32)
    bias = rng.normal(0, 0.02, (1, num_classes)).astype(np.float32)
    hot = rng.choice(num_classes, 4, replace=False)
    bias[0, hot] += np.array([8.0, 6.0, 4.5, 3.5], np.float32)
    logits = b.add(b.matmul(feat, b.const(w), name="head"), b.const(bias))
    b.result(b.softmax(logits, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "lstm-tiny.xml"
    model = build_lstm()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
