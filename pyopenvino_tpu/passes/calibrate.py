"""Activation calibration for full-INT8 inference.

Weight-only INT8 (passes/quantize.py) needs no data; quantizing
*activations* too (QuantMode.INT8_FULL — int8×int8 on the MXU's double-rate
int path, f32 dequant epilogue) needs per-tensor scales observed on
representative inputs.  The reference has no quantization at all
(SURVEY.md §2); this pass plays the role OpenVINO's POT/NNCF calibration
plays for the real engine.

Method: max-abs over N calibration samples, observed with the numpy
interpreter (the differential twin — offline, no compilation needed), at
every tensor feeding the data port (port 0) of a quantizable op
(Convolution / MatMul).  Scale = absmax / 127, symmetric.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np

from pyopenvino_tpu.ir.model import Model

# ops whose port-0 input gets an activation scale.  GroupConvolution
# (depthwise) included: int8 activations halve its HBM bytes — depthwise is
# bandwidth-bound, so bytes are exactly what it pays for.
QUANTIZABLE = ("Convolution", "GroupConvolution", "MatMul")

# additionally-observed ops: the int8-dataflow ACCEPTERS (LRN/AvgPool —
# fused dequant-on-read), whose calibrated input scales let the
# compiler's demand propagation (runtime/compiler.py _find_int8_edges)
# store tensors whose consumers include no conv sink — e.g. the
# GoogLeNet stem's conv→pool→LRN chain, pure HBM-bound VPU work.
# Carries (MaxPool/ReLU) need no scale of their own: they propagate
# their OUTPUT edge's demand only, so observing them would just burn
# calibration time on scales nothing reads.
OBSERVED = QUANTIZABLE + ("LRN", "AvgPool")

PortKey = Tuple[int, int]  # (consumer node id, consumer port) — always port 0


def calibrate_activations(
    model: Model, samples: Iterable[Dict[str, np.ndarray]],
    percentile: float = 100.0,
) -> Dict[int, float]:
    """Return {consumer_node_id: scale} for every quantizable data input.

    `samples` is an iterable of input dicts ({param_name: blob}).

    `percentile` < 100 clips the observed |activation| distribution before
    deriving the scale (max over samples of the per-sample percentile) —
    the standard defense against single-outlier activations blowing up the
    per-tensor scale (what OpenVINO POT/NNCF and TensorRT calibrators
    offer).  Default is pure max-abs: on outlier-free distributions
    (measured on the synthetic-weight models) clipping only adds error;
    flip to ~99.9 when calibrating real models with heavy-tailed
    activations.
    """
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    absmax: Dict[int, float] = {}

    def observe(node, ins, _outs):
        if node.op_type in OBSERVED and 0 in ins:
            a = np.abs(np.asarray(ins[0], dtype=np.float32))
            m = float(np.percentile(a, percentile)
                      if percentile < 100.0 else a.max())
            absmax[node.id] = max(absmax.get(node.id, 0.0), m)

    # one interpreter walk per sample — the numpy-twin loop lives in
    # Interpreter.run (its per-node `observe` hook exists for exactly
    # this; the pass used to hand-roll a third copy of the walk)
    it = Interpreter(model)
    n_samples = 0
    for inputs in samples:
        n_samples += 1
        it.run(inputs, observe=observe)
    if n_samples == 0:
        raise ValueError("calibration needs at least one sample")
    return {
        nid: (m / 127.0 if m > 0 else 1.0) for nid, m in absmax.items()
    }
