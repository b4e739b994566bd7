"""Fold weight-side FakeQuantize nodes into their Const producers.

POT/NNCF-quantized OpenVINO IRs wrap every conv/matmul weight in a
Const → FakeQuantize(levels, const ranges) → consumer chain (the op the
reference engine dies on, inference_engine.py:270-272).  The FQ of a
constant with constant ranges is itself a constant: this pass evaluates
it once at compile time through the op's own ref_compute (so folding
and runtime emulation can never disagree) and rewires consumers to a
plain Const holding the grid-snapped values.

Two effects:
- the per-inference FQ computation on a weight tensor disappears, and
- `passes/quantize.quantize_weights` (which looks for Const→weight-port
  edges) now sees the effective weights, so INT8 modes engage on
  POT-quantized IRs.  A 256-level symmetric FQ grid survives the int8
  re-quantization nearly losslessly — both live on a 255-step lattice.

Activation-side FakeQuantize nodes (non-const data input) are left in
place and run as exact elementwise emulation (ops/extended.py) — except
under QuantMode.INT8_FULL, where `extract_act_scales` recognizes
symmetric zero-exact grids (il = -(L/2)/(L/2-1)*ih, the convention
POT/NNCF and tools/pot_quantize.py emit) and converts them into the
engine's native activation scales: the FQ node disappears and its
consumers quantize on the fly to the SAME ±127-code lattice on the MXU
integer path.  A POT-quantized IR thus runs full-INT8 with no
calibration samples — the quantization intent travels in the IR.

Safety: the data Const and the FQ node must be single-consumer; range
consts are dropped only when nothing else reads them.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pyopenvino_tpu.ir.model import Edge, Model
from pyopenvino_tpu.ops import get_op


def fold_fake_quantize(model: Model) -> Model:
    """Return a rewritten Model (original untouched) with const-input
    FakeQuantize nodes evaluated and removed."""
    nodes = dict(model.nodes)
    edges = list(model.edges)
    removed = set()
    changed = False

    for fq in model.find_by_type("FakeQuantize"):
        ins = model.in_edges[fq.id]
        srcs = {port: model.nodes[src] for port, (src, _) in ins.items()}
        if any(
            srcs[p].op_type != "Const" or srcs[p].const is None
            for p in range(5)
        ):
            continue  # activation FQ (or structural parse) — leave in place
        data_id = ins[0][0]
        if len(model.out_edges[data_id]) != 1:
            continue  # shared weight const: folding would affect others

        op = get_op("FakeQuantize")
        out = op.ref_compute(
            fq, {p: np.asarray(srcs[p].const) for p in range(5)}
        )[fq.out_port]
        nodes[data_id] = dataclasses.replace(
            nodes[data_id], const=np.ascontiguousarray(out))

        # rewire: FQ's consumers now read the (rewritten) data Const
        d_src, d_sport = ins[0]
        edges = [e for e in edges if e.dst != fq.id]
        edges = [
            Edge(d_src, d_sport, e.dst, e.dst_port) if e.src == fq.id else e
            for e in edges
        ]
        removed.add(fq.id)
        for p in range(1, 5):
            rid = ins[p][0]
            if all(e.dst == fq.id for e in model.edges if e.src == rid):
                removed.add(rid)
        changed = True

    if not changed:
        return model
    for nid in removed:
        nodes.pop(nid, None)
    return Model(model.name, nodes, edges)


def _symmetric_scale(fq, srcs, levels: int):
    """The per-tensor int8 scale if the FQ encodes the zero-exact
    symmetric grid (same input/output ranges, scalar, il = -(L/2)*step,
    ih = (L/2-1)*step), else None."""
    try:
        il = float(np.asarray(srcs[1].const).reshape(()))
        ih = float(np.asarray(srcs[2].const).reshape(()))
        ol = float(np.asarray(srcs[3].const).reshape(()))
        oh = float(np.asarray(srcs[4].const).reshape(()))
    except Exception:
        return None  # per-channel or non-const ranges
    if (il, ih) != (ol, oh) or ih <= 0 or il >= 0:
        return None
    half = levels // 2
    step = ih / (half - 1)
    if abs(il + half * step) > 1e-6 * max(abs(il), step):
        return None  # zero not on the grid — not the engine's lattice
    return step


def extract_act_scales(model: Model, quantizable) -> tuple:
    """Return (model', {consumer_node_id: scale}) with symmetric
    activation FakeQuantize nodes feeding `quantizable` op types
    removed and converted to native per-tensor activation scales
    (the same {nid: scale} table passes/calibrate produces)."""
    nodes = dict(model.nodes)
    edges = list(model.edges)
    removed = set()
    scales = {}

    for fq in model.find_by_type("FakeQuantize"):
        ins = model.in_edges[fq.id]
        srcs = {port: model.nodes[src] for port, (src, _) in ins.items()}
        if srcs[0].op_type == "Const":
            continue  # weight FQ — fold_fake_quantize's job
        if any(srcs[p].op_type != "Const" or srcs[p].const is None
               for p in range(1, 5)):
            continue
        consumers = [(dst, dport) for _, dst, dport in
                     model.out_edges[fq.id]]
        if not consumers or any(
            model.nodes[d].op_type not in quantizable or p != 0
            for d, p in consumers
        ):
            continue  # feeds something the int8 path cannot honour
        scale = _symmetric_scale(
            fq, srcs, int(fq.attrs.get("levels", 256)))
        if scale is None:
            continue

        d_src, d_sport = ins[0]
        edges = [e for e in edges if e.dst != fq.id]
        edges = [
            Edge(d_src, d_sport, e.dst, e.dst_port) if e.src == fq.id else e
            for e in edges
        ]
        removed.add(fq.id)
        for p in range(1, 5):
            rid = ins[p][0]
            if all(e.dst == fq.id for e in model.edges if e.src == rid):
                removed.add(rid)
        for d, _ in consumers:
            scales[d] = max(scale, scales.get(d, 0.0))

    if not scales:
        return model, {}
    for nid in removed:
        nodes.pop(nid, None)
    return Model(model.name, nodes, edges), scales
