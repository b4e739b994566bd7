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


def reshape_model(model: Model, new_shapes: Dict[str, Tuple[int, ...]]) -> Model:
    """Return a new Model with Parameter shapes replaced and every
    declared port dim re-derived by shape inference — the engine's
    equivalent of OpenVINO's ``IENetwork.reshape`` (an API the
    reference does not implement; its shapes are frozen into the XML).

    Fully-convolutional graphs (e.g. the U-Net family) accept any
    compatible resolution; graphs with shape-capturing constants
    (fixed Reshape flatten targets, PriorBox anchors) raise the op's
    own shape error — the same contract the real engine has.
    """
    import dataclasses

    from pyopenvino_tpu.ir.model import TensorInfo

    by_name = {n.name: n for n in model.parameters}
    unknown = sorted(set(new_shapes) - set(by_name))
    if unknown:
        raise ValueError(
            f"reshape: not Parameter inputs: {unknown}; "
            f"inputs are {sorted(by_name)}"
        )

    nodes = dict(model.nodes)
    for name, shape in new_shapes.items():
        p = by_name[name]
        outs = {
            port: dataclasses.replace(info, shape=tuple(int(d) for d in shape))
            for port, info in p.outputs.items()
        }
        nodes[p.id] = dataclasses.replace(p, outputs=outs)

    remodel = Model(model.name, nodes, list(model.edges))
    return rederive_ports(remodel)  # raises where ops can't adapt


def bake_batch(model: Model, batch: int) -> Model:
    """Return a model with ``batch`` baked into every Parameter AND every
    shape-capturing Reshape target whose leading dim is the unit batch —
    the ``set_batch`` analogue for throughput compilation.

    Why this exists (measured, docs/MEASUREMENTS.md round-5): the vmap
    batching path keeps the declared unit batch as a size-1 dim in every
    activation (rank-5 tensors), and the TPU conv emitters then pick
    batch-in-sublanes layouts that surround the convolutions with
    relayout copies (~2 ms of GoogLeNet's 24.8 ms device step).  Baking
    the batch gives XLA plain rank-4 NHWC activations — GoogLeNet
    b512 measured +17% (20.1k → 23.6k img/s).

    Only batch-polymorphic graphs qualify: a Reshape that DROPS the batch
    dim (e.g. SSD's (1, 7668) → (1917, 4) box decode) has no consistent
    baked realization and fails the rederive with the op's own shape
    error — callers fall back to vmap batching (batched_fn).  Subgraph
    bodies (TensorIterator/Loop/If) are NOT rewritten — their Parameters
    stay at the declared batch, so TI models also take the vmap path
    (measured fine there: ocr-ti 312k img/s at b512 vmapped)."""
    import dataclasses as _dc

    if batch < 1:
        raise ValueError(f"bake_batch: bad batch {batch}")
    nodes = dict(model.nodes)
    for n in model.nodes.values():
        if n.op_type != "Reshape" or 1 not in model.in_edges[n.id]:
            continue
        src, _ = model.in_edges[n.id][1]
        cn = model.nodes[src]
        data_in = n.inputs.get(0)
        if (
            cn.op_type == "Const"
            and cn.const is not None
            and cn.const.size
            and int(np.asarray(cn.const).reshape(-1)[0]) == 1
            and (data_in is None or not data_in.shape
                 or data_in.shape[0] == 1)
            # a shared Const (feeding anything besides this Reshape's
            # target port) must not be rewritten under other consumers
            and len(model.out_edges[src]) == 1
        ):
            t = np.asarray(cn.const).copy().reshape(-1)
            t[0] = batch
            nodes[cn.id] = _dc.replace(cn, const=t)
    new_shapes = {
        p.name: (batch,) + tuple(p.outputs[p.out_port].shape[1:])
        for p in model.parameters
    }
    return reshape_model(Model(model.name, nodes, list(model.edges)),
                         new_shapes)


def rederive_ports(model: Model) -> Model:
    """Re-run shape inference and rewrite every declared port dim so the
    model stays self-consistent (writer round-trips, inspect tools,
    declared-shape validation).  Declared dtypes are kept as-is — callers
    inserting typed nodes (reshape, preprocess) set them when constructing
    the nodes."""
    import dataclasses

    analysis = infer_shapes(model)

    final = {}
    for nid, node in model.nodes.items():
        ins = {
            port: dataclasses.replace(
                info, shape=analysis.shape(*model.in_edges[nid][port]))
            for port, info in node.inputs.items()
        }
        outs = {
            port: dataclasses.replace(info, shape=analysis.shape(nid, port))
            for port, info in node.outputs.items()
        }
        final[nid] = dataclasses.replace(node, inputs=ins, outputs=outs)
    return Model(model.name, final, list(model.edges))
