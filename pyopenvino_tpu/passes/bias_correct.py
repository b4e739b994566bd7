"""Analytic bias correction for INT8 weight quantization.

Per-output-channel int8 rounding shifts each conv/matmul output's MEAN
(E[(W − deq(W_q)) · x] ≠ 0 whenever the input has a nonzero mean — ReLU
networks always do).  The standard fix (OpenVINO POT's BiasCorrection,
Nagel et al.'s data-free quantization) folds the expected shift into the
layer's bias:

    δ[o] = Σ_{i,kh,kw} (W_fp − deq(W_q))[o, i, kh, kw] · x̄[i]

with x̄ the per-channel mean input observed over calibration samples
(spatially stationary approximation — exact in expectation for the mean).
The reference has no quantization at all (SURVEY.md §2); OpenVINO ships
this as a POT pass.

The correction applies to the consumer-facing *bias Const* identified by
the epilogue-fusion finder (passes/fuse.py) and is added when the weight
pytree materializes (runtime/compiler.py _build_weights) — the Node
objects themselves are never mutated, so the fp32 interpreter twin stays
the uncorrected reference.  Enable with ``Config(bias_correction=True)``
(needs calibration samples, like INT8-FULL).
"""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ir.model import Model


def bias_corrections(
    model: Model,
    analysis,
    quantized: Dict[int, tuple],
    samples: Iterable[Dict[str, np.ndarray]],
) -> Dict[int, np.ndarray]:
    """{bias_const_node_id: per-channel delta} for every fused
    conv/grouped-conv/2-D-matmul whose weight const is int8-quantized and
    whose bias const is not shared with another consumer."""
    from pyopenvino_tpu.passes.fuse import find_fusions
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    fusions = find_fusions(model, analysis)
    roots = {
        f.root: f.bias_src[0]
        for f in fusions.values()
        if f.bias_src is not None
        # a bias shared by several Adds would receive one root's delta
        # but shift every consumer — skip those
        and len(model.out_edges[f.bias_src[0]]) == 1
    }
    if not roots:
        return {}

    # per-root mean input channel vector over all samples (batch+spatial
    # mean for convs, row mean for matmuls)
    sums: Dict[int, np.ndarray] = {}
    counts: Dict[int, int] = {}

    def observe(node, ins, _outs):
        if node.id not in roots or 0 not in ins:
            return
        a = np.asarray(ins[0], np.float64)
        if node.op_type in ("Convolution", "GroupConvolution"):
            v = a.mean(axis=(0, 2, 3))  # NCHW → per-channel mean
        else:
            v = a.reshape(-1, a.shape[-1]).mean(axis=0)
        sums[node.id] = sums.get(node.id, 0.0) + v
        counts[node.id] = counts.get(node.id, 0) + 1

    it = Interpreter(model)
    n = 0
    for inputs in samples:
        n += 1
        it.run(inputs, observe=observe)
    if n == 0:
        raise ValueError("bias correction needs calibration samples")

    out: Dict[int, np.ndarray] = {}
    for root_id, bias_id in roots.items():
        node = model.nodes[root_id]
        w_src = model.in_edges[root_id].get(1)
        if w_src is None or w_src[0] not in quantized or root_id not in sums:
            continue
        w_node = model.nodes[w_src[0]]
        w_fp = np.asarray(w_node.const, np.float64)
        q, scale = quantized[w_src[0]]
        dw = w_fp - q.astype(np.float64) * np.asarray(scale, np.float64)
        xbar = sums[root_id] / counts[root_id]

        if node.op_type == "Convolution":
            # OIHW: δ[o] = Σ_i (Σ_{kh,kw} ΔW[o,i]) · x̄[i]
            delta = np.einsum("oikl,i->o", dw, xbar)
        elif node.op_type == "GroupConvolution":
            # (G, Co, Ci, kh, kw); input channels are G·Ci, grouped
            g, co, ci = dw.shape[:3]
            delta = np.einsum(
                "gcikl,gi->gc", dw, xbar.reshape(g, ci)
            ).reshape(g * co)
        elif node.op_type == "MatMul" and dw.ndim == 2 and not A.get_bool(
            node.attrs, "transpose_a", False
        ):
            # (transpose_a layers would need the mean over the OTHER input
            # axis — rare enough that skipping beats correcting wrongly)
            tb = A.get_bool(node.attrs, "transpose_b", False)
            delta = (dw @ xbar) if tb else (xbar @ dw)
        else:
            continue
        out[bias_id] = delta.astype(np.float32)
    return out
