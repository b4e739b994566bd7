"""Static shape inference + compile-time value propagation.

Walks the graph in topological order computing every port's shape from the
op semantics (not from the declared dims — those are used as a cross-check by
tests/test_shapes.py), and propagates statically-known *values* through the
shape-subgraphs (Const → ShapeOf → StridedSlice → PriorBoxClustered →
Concat...).  The value table doubles as the constant-folding result the
compiler uses to drop those subgraphs from the runtime graph — the
opportunity called out in SURVEY.md §3.5 (the reference recomputes SSD's
anchors from ShapeOf chains on every inference).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir.model import Model
from pyopenvino_tpu.ops import get_op

PortKey = Tuple[int, int]  # (node_id, port_id)


@dataclasses.dataclass
class ShapeAnalysis:
    shapes: Dict[PortKey, Tuple[int, ...]]
    values: Dict[PortKey, np.ndarray]

    def shape(self, nid: int, port: int) -> Tuple[int, ...]:
        return self.shapes[(nid, port)]

    def value(self, nid: int, port: int) -> Optional[np.ndarray]:
        return self.values.get((nid, port))


# Value propagation is only worthwhile for small tensors (shape vectors,
# anchor tables).  Cap folding so we never fold a conv output by accident.
_MAX_FOLD_ELEMS = 1 << 20


def infer_shapes(model: Model) -> ShapeAnalysis:
    shapes: Dict[PortKey, Tuple[int, ...]] = {}
    values: Dict[PortKey, np.ndarray] = {}

    for node in model:
        op = get_op(node.op_type)
        in_shapes: Dict[int, Tuple[int, ...]] = {}
        in_values: Dict[int, Optional[np.ndarray]] = {}
        for port, (src, src_port) in sorted(model.in_edges[node.id].items()):
            in_shapes[port] = shapes[(src, src_port)]
            in_values[port] = values.get((src, src_port))

        res = op.infer_shapes(node, in_shapes, in_values)
        for port, shape in res.shapes.items():
            shapes[(node.id, port)] = tuple(int(d) for d in shape)
        for port, val in res.values.items():
            if val is not None and val.size <= _MAX_FOLD_ELEMS:
                values[(node.id, port)] = np.asarray(val)

    return ShapeAnalysis(shapes, values)


def check_against_declared(model: Model, analysis: ShapeAnalysis):
    """Raise if any inferred shape disagrees with the XML-declared dims."""
    mismatches = []
    for node in model:
        for port, info in node.outputs.items():
            got = analysis.shapes.get((node.id, port))
            if got is None:
                mismatches.append((node, port, "missing", info.shape))
            elif tuple(got) != tuple(info.shape):
                mismatches.append((node, port, got, info.shape))
    if mismatches:
        lines = [
            f"  {n.op_type} {n.name!r} port {p}: inferred {got} declared {want}"
            for n, p, got, want in mismatches[:20]
        ]
        raise AssertionError(
            f"{len(mismatches)} shape mismatches:\n" + "\n".join(lines)
        )
