"""Offline post-training quantizer: take any IR, calibrate, and write a
quantized IR with FakeQuantize nodes — the artifact-producing direction
of the FakeQuantize story (passes/fold_fq.py is the consuming one).

This plays the role OpenVINO's POT/NNCF plays for the real engine: the
output is a plain IR v10 file whose quantization intent travels *with
the model* (levels + ranges as FakeQuantize nodes), loadable by this
engine — where weight-side FQ folds back into the native INT8 path at
compile time — or by any other OpenVINO-compatible runtime.  The
reference has no quantization tooling at all (SURVEY.md §2).

Scheme (symmetric, the engine's native grid):
- weights (Const -> Convolution/GroupConvolution/MatMul/
  ConvolutionBackpropData weight port): per-output-channel 256-level FQ
  for the conv family (OIHW axis 0 / GOIHW axes (0,1) / IOHW axis 1),
  per-tensor for MatMul;
- activations (data port 0 of quantizable consumers): per-tensor FQ
  with ranges from interpreter-observed max-abs over the calibration
  samples (passes/calibrate.calibrate_activations, percentile-clipped
  like POT's default calibrator).

Ranges use the standard symmetric-int8 convention (what OpenVINO
POT/NNCF emit for signed symmetric quantization): for absmax `hi`,
il = -(L/2)/(L/2-1) * hi and ih = hi with L levels — i.e. step =
hi/127 at L=256, so ZERO sits exactly on the grid (k = 128) and the
lattice coincides with the engine's own ±127-code int8 grid.  Two
consequences: exact-zero activations (everything post-ReLU) survive
untouched, and fold_fq -> quantize_weights requantization is LOSSLESS
(same lattice, no half-step re-rounding).

Usage:
    python tools/pot_quantize.py in.xml out.xml [--samples 8]
        [--percentile 100] [--levels 256] [--no-activations]

Calibration inputs are synthetic uniform [0, 255) blobs by default
(matching how every model here takes raw pixels); point --samples at
real data by editing gen_samples or importing pot_quantize.quantize_ir.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import Dict, Iterable, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.model import Edge, Model, Node, TensorInfo  # noqa: E402

# (consumer op type, weight port) -> per-output-channel axes in the
# weight layout, or None for per-tensor.  Mirrors passes/quantize.py.
_WEIGHT_AXES = {
    "Convolution": (0,),             # OIHW
    "GroupConvolution": (0, 1),      # GOIHW
    "ConvolutionBackpropData": (1,),  # IOHW
    "MatMul": None,                  # per-tensor (transpose_b varies)
}


def _per_channel_hi(w: np.ndarray, axes) -> np.ndarray:
    """max-abs reduced over every axis NOT in `axes`, keepdims."""
    reduce_axes = tuple(i for i in range(w.ndim) if i not in axes)
    hi = np.abs(w).max(axis=reduce_axes, keepdims=True)
    return np.maximum(hi, 1e-12).astype(np.float32)


def _sym_ranges(hi: np.ndarray, levels: int):
    """(lo, hi) of the zero-exact symmetric grid: step = hi/(L/2-1),
    lo = -(L/2)*step."""
    half = levels // 2
    step = hi / (half - 1)
    return (-half * step).astype(np.float32), hi.astype(np.float32)


class _Surgeon:
    """Insert-only graph editing on (nodes, edges) copies."""

    def __init__(self, model: Model):
        self.model = model
        self.nodes: Dict[int, Node] = dict(model.nodes)
        self.edges = list(model.edges)
        self._next = max(model.nodes) + 1

    def add_const(self, value: np.ndarray, name: str) -> int:
        nid = self._next
        self._next += 1
        info = TensorInfo(tuple(value.shape), np.dtype(value.dtype))
        self.nodes[nid] = Node(nid, name, "Const", {}, {}, {0: info},
                               const=np.ascontiguousarray(value))
        return nid

    def insert_fq(self, src: int, sport: int, dsts, lo: np.ndarray,
                  hi: np.ndarray, levels: int, name: str) -> int:
        """Splice a FakeQuantize between (src, sport) and the given
        (dst, dport) consumer edges; returns the FQ node id."""
        data_info = self.model.nodes[src].outputs[sport]
        rid_lo = self.add_const(lo, f"{name}/low")
        rid_hi = self.add_const(hi, f"{name}/high")
        fq_id = self._next
        self._next += 1
        rinfo = TensorInfo(tuple(lo.shape), np.dtype(np.float32))
        self.nodes[fq_id] = Node(
            fq_id, name, "FakeQuantize", {"levels": str(levels)},
            {0: data_info, 1: rinfo, 2: rinfo, 3: rinfo, 4: rinfo},
            {5: data_info},
        )
        drop = set(dsts)
        self.edges = [e for e in self.edges
                      if not (e.src == src and e.src_port == sport
                              and (e.dst, e.dst_port) in drop)]
        self.edges += [
            Edge(src, sport, fq_id, 0),
            Edge(rid_lo, 0, fq_id, 1), Edge(rid_hi, 0, fq_id, 2),
            Edge(rid_lo, 0, fq_id, 3), Edge(rid_hi, 0, fq_id, 4),
        ]
        self.edges += [Edge(fq_id, 5, d, p) for d, p in dsts]
        return fq_id

    def build(self) -> Model:
        return Model(self.model.name, self.nodes, self.edges)


def quantize_ir(
    model: Model,
    samples: Optional[Iterable[Dict[str, np.ndarray]]] = None,
    levels: int = 256,
    percentile: float = 100.0,
    activations: bool = True,
) -> Model:
    """Return a new Model with FakeQuantize nodes inserted.  `samples`
    (calibration input dicts) are required when activations=True."""
    s = _Surgeon(model)

    # --- weights: one per-channel FQ per Const->weight-port edge group
    for const in model.find_by_type("Const"):
        group = []
        for sport, dst, dport in model.out_edges[const.id]:
            cons = model.nodes[dst]
            if dport == 1 and cons.op_type in _WEIGHT_AXES:
                group.append((dst, dport))
        if not group or const.const is None:
            continue
        w = np.asarray(const.const, np.float32)
        axes = _WEIGHT_AXES[model.nodes[group[0][0]].op_type]
        if len({model.nodes[d].op_type for d, _ in group}) > 1:
            axes = None  # shared across op types: per-tensor is safe
        hi = (_per_channel_hi(w, axes) if axes is not None
              else np.array([max(float(np.abs(w).max()), 1e-12)],
                            np.float32))
        lo, hi = _sym_ranges(hi, levels)
        s.insert_fq(const.id, 0, group, lo, hi, levels,
                    f"{const.name}/fq")

    # --- activations: per-tensor FQ on quantizable data inputs
    if activations:
        if samples is None:
            raise ValueError("activation quantization needs samples")
        from pyopenvino_tpu.passes.calibrate import (
            QUANTIZABLE, calibrate_activations,
        )

        scales = calibrate_activations(model, samples,
                                       percentile=percentile)
        # group consumer edges by producing port so shared tensors get
        # ONE FakeQuantize (widest observed range wins)
        by_src: Dict[tuple, list] = {}
        for node in model:
            if node.op_type not in QUANTIZABLE or node.id not in scales:
                continue
            src, sport = model.in_edges[node.id][0]
            if model.nodes[src].op_type == "FakeQuantize":
                continue  # already quantized upstream (pre-quantized IR)
            by_src.setdefault((src, sport), []).append(node.id)
        for (src, sport), consumers in by_src.items():
            hi_v = max(scales[c] for c in consumers) * ((levels // 2) - 1)
            lo, hi = _sym_ranges(np.array([hi_v], np.float32), levels)
            s.insert_fq(src, sport, [(c, 0) for c in consumers],
                        lo, hi, levels,
                        f"{model.nodes[src].name}/act_fq")

    return s.build()


def gen_samples(model: Model, n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return [
        {p.name: rng.uniform(0, 255, p.outputs[0].shape).astype(np.float32)
         for p in model.parameters}
        for _ in range(n)
    ]


def main():
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("input_xml")
    ap.add_argument("output_xml")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--percentile", type=float, default=100.0)
    ap.add_argument("--levels", type=int, default=256)
    ap.add_argument("--no-activations", action="store_true")
    args = ap.parse_args()

    model = read_ir_model(args.input_xml, args.input_xml[:-4] + ".bin")
    q = quantize_ir(
        model,
        samples=None if args.no_activations else gen_samples(
            model, args.samples),
        levels=args.levels,
        percentile=args.percentile,
        activations=not args.no_activations,
    )
    write_ir_model(q, args.output_xml)
    n_fq = len(q.find_by_type("FakeQuantize"))
    print(f"wrote {args.output_xml}: {n_fq} FakeQuantize nodes "
          f"({len(q.nodes)} nodes total, was {len(model.nodes)})")


if __name__ == "__main__":
    main()
