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

    Reshape targets are patched BY EVIDENCE, not by pattern: inference
    walks the graph with the batched Parameters, and any Reshape whose
    DATA INPUT now leads with the batch while its constant target still
    leads with 1 gets that 1 rewritten to ``batch`` (this covers both
    failing flattens like GoogLeNet's (1, 1024) target AND
    batch-ABSORBING targets like SSD's [1, -1], which would silently
    fold the batch away).  Unit-leading reshapes whose input does not
    carry the batch (a Reduce-to-(1,1,1,1) holder) are never touched.  A
    batch-carrying Reshape whose target cannot be patched (shared Const,
    non-constant, no leading 1) raises: graphs that genuinely drop the
    batch have no baked realization — callers fall back to vmap batching
    (bench.py does).  Batch-sensitive ops (DetectionOutput) get an
    explicit ``_baked_batch`` attr so they never have to guess from
    shapes.  Subgraph bodies (TensorIterator/Loop/If) are NOT rewritten —
    their Parameters stay at the declared batch, so TI models take the
    vmap path (measured fine there: ocr-ti 312k img/s at b512 vmapped)."""
    import dataclasses as _dc

    from pyopenvino_tpu.ops import get_op

    if batch < 1:
        raise ValueError(f"bake_batch: bad batch {batch}")
    nodes = dict(model.nodes)
    for n in model.nodes.values():
        if n.op_type == "DetectionOutput":
            attrs = dict(n.attrs)
            attrs["_baked_batch"] = str(batch)
            nodes[n.id] = _dc.replace(n, attrs=attrs)
    for p in model.parameters:
        shape = (batch,) + tuple(p.outputs[p.out_port].shape[1:])
        outs = {
            port: _dc.replace(info, shape=shape)
            for port, info in p.outputs.items()
        }
        nodes[p.id] = _dc.replace(nodes.get(p.id, p), outputs=outs)
    m = Model(model.name, nodes, list(model.edges))

    # evidence walk: batched shapes flow forward; patch targets in place
    shapes, values = {}, {}
    for node in m:
        ins = sorted(m.in_edges[node.id].items())
        in_shapes = {p: shapes[k] for p, k in ins}
        in_values = {p: values.get(k) for p, k in ins}
        if (
            node.op_type == "Reshape"
            and batch > 1
            and in_shapes.get(0)
            and in_shapes[0][0] == batch
            and in_values.get(1) is not None
            and int(np.asarray(in_values[1]).reshape(-1)[0]) == -1
        ):
            # leading -1 on a batch-leading input: fine iff the REST of
            # the target covers exactly the per-example size (the -1
            # then resolves to the batch, e.g. mnist's (-1, 576)
            # flatten); anything else silently ABSORBS the batch into
            # the row axis — refuse (the vmap-fallback signal)
            t = [int(v) for v in np.asarray(in_values[1]).reshape(-1)]
            per_ex = int(np.prod(in_shapes[0][1:])) if len(
                in_shapes[0]) > 1 else 1
            rest = 1
            ok = True
            for i, v in enumerate(t[1:], start=1):
                if v == -1:
                    ok = False  # a second -1: underdetermined
                    break
                if v == 0:
                    v = in_shapes[0][i] if i < len(in_shapes[0]) else 0
                rest *= v
            if not ok or rest != per_ex:
                raise ValueError(
                    f"bake_batch: Reshape {node.name!r} consumes the "
                    f"batch through a leading -1 target — use vmap "
                    f"batching")
        if (
            node.op_type == "Reshape"
            and batch > 1
            and in_shapes.get(0)
            and in_shapes[0][0] == batch
            and in_values.get(1) is not None
            and int(np.asarray(in_values[1]).reshape(-1)[0]) == 1
        ):
            src, _sport = m.in_edges[node.id][1]
            cn = m.nodes[src]
            if (cn.op_type != "Const" or cn.const is None
                    or len(m.out_edges[src]) != 1):
                raise ValueError(
                    f"bake_batch: Reshape {node.name!r} consumes the "
                    f"batch but its target is shared or non-constant — "
                    f"use vmap batching")
            from pyopenvino_tpu.ir.model import TensorInfo

            t = np.asarray(cn.const).copy().reshape(-1)
            t[0] = batch
            # REPLACE, never mutate: the nodes dict shares Node objects
            # with the caller's model
            m.nodes[src] = _dc.replace(
                cn, const=t,
                outputs={cn.out_port: TensorInfo(shape=t.shape,
                                                 dtype=t.dtype)})
            values[(src, cn.out_port)] = t
            in_values[1] = t
        res = get_op(node.op_type).infer_shapes(node, in_shapes, in_values)
        for port, shape in res.shapes.items():
            shapes[(node.id, port)] = tuple(int(d) for d in shape)
        for port, val in res.values.items():
            # same folding cap as infer_shapes(): without it every
            # weight-processing chain constant-folds in host numpy on
            # each bake, for values rederive discards anyway
            if val is not None and val.size <= _MAX_FOLD_ELEMS:
                values[(node.id, port)] = np.asarray(val)

    return rederive_ports(m)


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
