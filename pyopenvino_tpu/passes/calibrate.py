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
    percentile: float = 100.0, method: str = "percentile",
) -> Dict[int, float]:
    """Return {consumer_node_id: scale} for every quantizable data input.

    `samples` is an iterable of input dicts ({param_name: blob}).

    method="percentile" (default): `percentile` < 100 clips the observed
    |activation| distribution before deriving the scale (max over samples
    of the per-sample percentile) — the standard defense against
    single-outlier activations blowing up the per-tensor scale (what
    OpenVINO POT/NNCF calibrators offer).  percentile=100 is pure max-abs:
    on outlier-free distributions (measured on the synthetic-weight
    models) clipping only adds error.

    method="kl": TensorRT-style entropy calibration — pick the clipping
    threshold minimizing the KL divergence between the observed
    |activation| histogram and its 128-level quantized rendering.  Unlike
    a fixed percentile it adapts the clip point per tensor to the actual
    distribution shape (two interpreter passes: absmax, then histograms).
    """
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    if method == "kl":
        return _calibrate_kl(model, samples)
    if method != "percentile":
        raise ValueError(f"unknown calibration method {method!r}")

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


_KL_BINS = 2048
_KL_LEVELS = 128  # symmetric int8: magnitudes land on 128 non-negative codes


def _kl_threshold(hist: np.ndarray, edges: np.ndarray) -> float:
    """The TensorRT entropy-calibration search: scan candidate clip points
    i ∈ [LEVELS, BINS]; for each, P = the reference distribution clipped at
    bin i (tail mass folded into the last bin), Q = P re-rendered through
    LEVELS uniform quantization buckets; return the bin-center threshold
    minimizing KL(P ‖ Q)."""
    total = hist.sum()
    if total == 0:
        return float(edges[-1])
    best_i, best_kl = _KL_BINS, np.inf
    for i in range(_KL_LEVELS, _KL_BINS + 1):
        # P: clipped reference — tail mass folded into the last kept bin
        p = hist[:i].astype(np.float64).copy()
        p[i - 1] += hist[i:].sum()
        psum = p.sum()
        if psum == 0:
            continue
        # Q: the UNFOLDED clipped histogram quantized to LEVELS groups and
        # expanded back over its nonzero bins (TensorRT's formulation —
        # folding the tail into Q too would make i=LEVELS exactly
        # reproduce P and always win with KL=0)
        ref = hist[:i].astype(np.float64)
        group = np.linspace(0, i, _KL_LEVELS + 1).astype(int)
        q = np.zeros(i, np.float64)
        for g in range(_KL_LEVELS):
            lo, hi = group[g], group[g + 1]
            nz = ref[lo:hi] > 0
            n_nz = int(nz.sum())
            if n_nz:
                q[lo:hi][nz] = ref[lo:hi].sum() / n_nz
        qsum = q.sum()
        if qsum == 0:
            continue
        p /= psum
        q /= qsum
        valid = p > 0
        if (q[valid] == 0).any():
            continue  # Q assigns zero mass where P has some: KL = inf
        kl = float(np.sum(p[valid] * np.log(p[valid] / q[valid])))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return float(edges[best_i])


def _calibrate_kl(model: Model, samples) -> Dict[int, float]:
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    samples = list(samples)
    if not samples:
        raise ValueError("calibration needs at least one sample")

    # pass 1: per-node absmax fixes each histogram's range
    absmax: Dict[int, float] = {}

    def observe_max(node, ins, _outs):
        if node.op_type in OBSERVED and 0 in ins:
            m = float(np.abs(np.asarray(ins[0], np.float32)).max())
            absmax[node.id] = max(absmax.get(node.id, 0.0), m)

    it = Interpreter(model)
    for inputs in samples:
        it.run(inputs, observe=observe_max)

    # pass 2: accumulate |activation| histograms
    hists: Dict[int, np.ndarray] = {}

    def observe_hist(node, ins, _outs):
        if node.op_type in OBSERVED and 0 in ins:
            m = absmax.get(node.id, 0.0)
            if m <= 0:
                return
            a = np.abs(np.asarray(ins[0], np.float32)).ravel()
            h, _ = np.histogram(a, bins=_KL_BINS, range=(0.0, m))
            hists[node.id] = hists.get(node.id, 0) + h

    for inputs in samples:
        it.run(inputs, observe=observe_hist)

    scales: Dict[int, float] = {}
    for nid, m in absmax.items():
        if m <= 0 or nid not in hists:
            scales[nid] = 1.0
            continue
        edges = np.linspace(0.0, m, _KL_BINS + 1)
        t = _kl_threshold(hists[nid], edges)
        scales[nid] = t / 127.0 if t > 0 else 1.0
    return scales
