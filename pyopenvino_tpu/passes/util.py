"""Shared helpers for graph-rewrite passes."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir.model import Model


def single_consumer(model: Model, nid: int) -> Optional[Tuple[object, int]]:
    """The unique (node, in_port) consuming nid's output, or None."""
    edges = model.out_edges[nid]
    if len(edges) != 1:
        return None
    _, dst, dport = edges[0]
    return model.nodes[dst], dport


def channel_aligned(shape, channels: int, rank: int = 4) -> bool:
    """True iff a const of `shape`, numpy-broadcast against a rank-`rank`
    NCHW tensor, applies a length-`channels` vector along the CHANNEL
    axis (dim 1) and nothing else.

    Numpy right-aligns: a rank-1 (C,) vector pairs with W, not C — the
    trap that made count-only checks accept per-column constants as
    per-channel whenever W == C (silent numeric corruption in the
    bias-fusion and BN-fold passes).  (C, 1, 1) and (1, C, 1, 1) are
    aligned; (C,) is only safe as a scalar (channels == 1)."""
    if int(np.prod(shape)) != channels:
        return False
    if len(shape) > rank:
        return False
    full = (1,) * (rank - len(shape)) + tuple(int(d) for d in shape)
    return full[1] == channels and all(
        d == 1 for i, d in enumerate(full) if i != 1
    )


def prune_dead_nodes(model: Model) -> Tuple[Model, int]:
    """Drop nodes that cannot reach any Result — dead branches, e.g. a
    training-time auxiliary head left in an exported IR.

    Parameters are always kept (pruning one would change the model's
    input-binding contract).  XLA DCEs the traced program regardless;
    this pass keeps dead weights out of the device pytree and spares the
    INT8 calibration walk from executing dead ops.  The numpy
    Interpreter deliberately does NOT prune: it is the faithful
    every-node twin (the reference executes all scheduled nodes,
    inference_engine.py:259-292), so dead-branch activations stay
    inspectable for debugging.

    Returns (model, dropped_count); the input model is returned
    unchanged when nothing is dead."""
    from pyopenvino_tpu.ir.model import ancestors

    # Assign nodes are graph sinks like Results: a variable write is an
    # observable effect (read back on the next inference), so its whole
    # producing subgraph is live (ops/state_ops.py)
    sinks = [n.id for n in model.results]
    sinks += [n.id for n in model.find_by_type("Assign")]
    keep = ancestors(model, sinks)
    keep |= {n.id for n in model.parameters}
    dropped = len(model.nodes) - len(keep)
    if not dropped:
        return model, 0
    nodes = {nid: model.nodes[nid] for nid in keep}
    edges = [e for e in model.edges if e.src in keep and e.dst in keep]
    return Model(model.name, nodes, edges), dropped


def folded_nodes(model: Model, analysis) -> set:
    """Runtime nodes whose every output is statically known — the set the
    compiler never traces (runtime/compiler.py) and the pipeline
    partitioner treats like Consts (parallel/pipeline.py).  ONE definition
    so the two can never disagree about what produces a runtime tensor."""
    out = set()
    for node in model:
        if node.op_type in ("Const", "Parameter", "Result"):
            continue
        if node.outputs and all(
            (node.id, p) in analysis.values for p in node.outputs
        ):
            out.add(node.id)
    return out
