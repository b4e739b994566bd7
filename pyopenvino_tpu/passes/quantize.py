"""INT8 weight-only quantization (per-output-channel, symmetric).

The reference has no quantization (SURVEY.md §2: addition mandated by the
BASELINE.json north star).  Scheme: for every Const feeding a
Convolution/GroupConvolution/MatMul weight port, store round(w / s) as int8
with s = max|w| / 127 per output channel.  The XLA backend dequantizes at
trace time (runtime/compiler.py weight_for) — a bandwidth win since int8
weights are what travels HBM→VMEM; the Pallas backend fuses the dequant into
the GEMM epilogue (kernels/gemm.py).

Accuracy gate (BASELINE.md): top-1 within 0.5% of FP32 — validated on the
shipped-weights MNIST models in tests/test_quant.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ir.model import Model

# weight ports eligible for quantization: (op_type, input_port)
_WEIGHT_PORTS = {("Convolution", 1), ("GroupConvolution", 1), ("MatMul", 1),
                 ("ConvolutionBackpropData", 1),
                 # recurrent W/R matrices (ops/recurrent.py resolves them
                 # through ctx.weight_for, so int8 consts dequantize at
                 # trace time like every other weight); biases stay float
                 ("LSTMCell", 3), ("LSTMCell", 4),
                 ("GRUCell", 2), ("GRUCell", 3),
                 ("RNNCell", 2), ("RNNCell", 3),
                 ("LSTMSequence", 4), ("LSTMSequence", 5),
                 ("GRUSequence", 3), ("GRUSequence", 4)}

_RECURRENT = {"LSTMCell", "GRUCell", "RNNCell",
              "LSTMSequence", "GRUSequence"}


def _quantize_array(
    w: np.ndarray, channel_axes: Tuple[int, ...]
) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8.  channel_axes: axes that index output
    channels (kept in the scale's shape); all others are reduced."""
    reduce_axes = tuple(a for a in range(w.ndim) if a not in channel_axes)
    absmax = np.abs(w).max(axis=reduce_axes, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_weights(
    model: Model, min_elems: int = 0
) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """Return {const_node_id: (int8 weights, float32 per-channel scales)}.

    ``min_elems`` (Config.quant_min_elems): weights below this element
    count stay float — the TensorRT/POT first/last-layer-exclusion
    practice for models whose tiny head/stem tensors (1×1 detection
    heads, 3-channel stems) carry negligible FLOPs but land their
    quantization error directly on a regression output.  Default 0
    (quantize everything): a blanket size cut would also catch real
    compute layers like SSD-MobileNet's (C,1,1,3,3) depthwise stacks,
    whose int8 path is the throughput story."""
    out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for node in model.find_by_type("Const"):
        if node.const is None or not np.issubdtype(node.const.dtype, np.floating):
            continue
        if min_elems and node.const.size < min_elems:
            continue
        consumers = [
            (model.nodes[dst], dport)
            for _, dst, dport in model.out_edges[node.id]
        ]
        if not consumers:
            continue
        # only quantize when every consumer reads it as a weight operand
        if not all((c.op_type, p) in _WEIGHT_PORTS for c, p in consumers):
            continue
        w = np.asarray(node.const, dtype=np.float32)

        def channel_axes(consumer):
            if consumer.op_type == "Convolution":
                return (0,)  # OIHW → per-O
            if consumer.op_type == "GroupConvolution":
                return (0, 1)  # GOIHW → per-(G,O)
            if consumer.op_type == "ConvolutionBackpropData":
                return (1,)  # IOHW (transposed layout) → per-O
            if consumer.op_type in _RECURRENT:
                # [gates·H, I] or [D, gates·H, H]: per output row (and
                # direction) — reduce only the contraction (last) axis
                return tuple(range(w.ndim - 1))
            tb = A.get_bool(consumer.attrs, "transpose_b", False)
            # MatMul: output channels are rows when transposed, cols not
            return (w.ndim - 2 if tb else w.ndim - 1,)

        # a const shared by consumers with different channel conventions
        # (e.g. two MatMuls with opposite transpose_b) has no single valid
        # per-channel axis — leave it float
        axes = {channel_axes(c) for c, _ in consumers}
        if len(axes) != 1:
            continue
        q, s = _quantize_array(w, axes.pop())
        out[node.id] = (q, s)
    return out
