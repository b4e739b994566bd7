"""Typed immutable graph IR.

Replaces the reference's ``networkx.DiGraph`` with dict node-attribute bags
(reference: pyopenvino/inference_engine.py:175-184, documented
README.md:88-125) by a lightweight typed DAG.  Nodes carry declared per-port
tensor metadata straight from the IR XML; edges are (src, src_port, dst,
dst_port) quadruples exactly like the reference's edge 'connection' attribute.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

# IR element_type / port precision → numpy dtype.
# (reference dtype tables: pyopenvino/common_def.py:13-17)
ELEMENT_TYPE_TO_DTYPE = {
    "f64": np.float64,
    "f32": np.float32,
    "f16": np.float16,
    "i64": np.int64,
    "i32": np.int32,
    "i16": np.int16,
    "i8": np.int8,
    "u8": np.uint8,
    "boolean": np.bool_,
}

PRECISION_TO_DTYPE = {
    "FP64": np.float64,
    "FP32": np.float32,
    "FP16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


@dataclasses.dataclass(frozen=True)
class TensorInfo:
    """Declared metadata of one port: shape + dtype (+ optional tensor names)."""

    shape: Tuple[int, ...]
    dtype: np.dtype
    names: Tuple[str, ...] = ()

    @property
    def size(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n


@dataclasses.dataclass(frozen=True)
class Edge:
    src: int
    src_port: int
    dst: int
    dst_port: int


@dataclasses.dataclass
class Node:
    """One IR layer.

    ``attrs`` holds the raw <data> strings (parsed lazily per-op via
    ir/attrs.py); ``const`` holds the decoded .bin tensor for Const nodes
    (decoded once at load — the reference re-decodes every inference,
    reference: pyopenvino/op_plugins/Const.py:11-14, a quirk we fix).
    """

    id: int
    name: str
    op_type: str
    attrs: Dict[str, str]
    inputs: Dict[int, TensorInfo]
    outputs: Dict[int, TensorInfo]
    const: Optional[np.ndarray] = None
    # TensorIterator/Loop: {"body": SubGraph}; If: {"then_body": ...,
    # "else_body": ...} (ir/subgraph.py) — nested body models with port maps
    subgraphs: Optional[Dict[str, object]] = None

    @property
    def out_port(self) -> int:
        """Primary (first) output port id."""
        if not self.outputs:
            # bare StopIteration here is opaque (and becomes a silent
            # early-exit inside generators, PEP 479) — Result nodes have
            # no output ports
            raise ValueError(
                f"{self.op_type} node {self.name!r} has no output ports"
            )
        return next(iter(self.outputs))

    def __repr__(self) -> str:  # keep dataclass noise out of test output
        return f"Node({self.id}, {self.op_type!r}, {self.name!r})"


class Model:
    """An immutable-after-construction DAG of Nodes."""

    def __init__(self, name: str, nodes: Dict[int, Node], edges: List[Edge]):
        self.name = name
        self.nodes = nodes
        self.edges = edges

        # dst node id → {dst_port: (src node id, src_port)}
        self.in_edges: Dict[int, Dict[int, Tuple[int, int]]] = {
            nid: {} for nid in nodes
        }
        # src node id → [(src_port, dst, dst_port)]
        self.out_edges: Dict[int, List[Tuple[int, int, int]]] = {
            nid: [] for nid in nodes
        }
        for e in edges:
            if e.dst_port in self.in_edges[e.dst]:
                raise ValueError(
                    f"duplicate edge into node {e.dst} port {e.dst_port}"
                )
            self.in_edges[e.dst][e.dst_port] = (e.src, e.src_port)
            self.out_edges[e.src].append((e.src_port, e.dst, e.dst_port))

        self._topo = self._toposort()

    # -- queries ----------------------------------------------------------

    def find_by_type(self, op_type: str) -> List[Node]:
        return [n for n in self.nodes.values() if n.op_type == op_type]

    def find_by_name(self, name: str) -> Optional[Node]:
        for n in self.nodes.values():
            if n.name == name:
                return n
        return None

    @property
    def parameters(self) -> List[Node]:
        return self.find_by_type("Parameter")

    @property
    def results(self) -> List[Node]:
        return self.find_by_type("Result")

    def topo_order(self) -> List[int]:
        return list(self._topo)

    def __iter__(self) -> Iterator[Node]:
        for nid in self._topo:
            yield self.nodes[nid]

    # -- internals ---------------------------------------------------------

    def _toposort(self) -> List[int]:
        """Deterministic Kahn topological sort (O(V+E) — the reference's
        ready-list sort is O(n²), reference: inference_engine.py:229-242)."""
        indeg = {nid: len(self.in_edges[nid]) for nid in self.nodes}
        ready = deque(sorted(nid for nid, d in indeg.items() if d == 0))
        order: List[int] = []
        while ready:
            nid = ready.popleft()
            order.append(nid)
            for _, dst, _ in sorted(self.out_edges[nid]):
                indeg[dst] -= 1
                if indeg[dst] == 0:
                    ready.append(dst)
        if len(order) != len(self.nodes):
            # mirrors the reference's DAG assert (inference_engine.py:184)
            raise ValueError("graph contains a cycle")
        return order

    def rebuilt(self) -> "Model":
        """Return a fresh Model over the same node/edge objects (used by
        passes after they mutate node sets)."""
        return Model(self.name, self.nodes, self.edges)


def ancestors(model: Model, target_ids) -> set:
    """Transitive input closure of ``target_ids`` (inclusive) — the one
    reach-from-targets walk shared by extract_subgraph and the
    dead-branch elimination pass (passes/util.py)."""
    keep = set()
    stack = list(target_ids)
    while stack:
        nid = stack.pop()
        if nid in keep:
            continue
        keep.add(nid)
        for src, _ in model.in_edges[nid].values():
            stack.append(src)
    return keep


def extract_subgraph(model: Model, output_names: List[str]) -> Model:
    """Cut a sub-model producing the named nodes' primary outputs.

    Keeps every ancestor of the cut points (Node objects are shared, not
    copied) and appends one Result per cut.  Used for per-stage debugging,
    compile-time bisection and model partitioning — capabilities the
    reference's flat task list cannot express."""
    targets = []
    for name in output_names:
        node = model.find_by_name(name)
        if node is None:
            raise KeyError(f"no node named {name!r}")
        targets.append(node)

    keep = ancestors(model, [t.id for t in targets])
    nodes = {nid: model.nodes[nid] for nid in keep}
    edges = [e for e in model.edges if e.src in keep and e.dst in keep]
    next_id = max(model.nodes) + 1
    for t in targets:
        nodes[next_id] = Node(
            id=next_id, name=f"{t.name}/cut", op_type="Result", attrs={},
            inputs={0: t.outputs[t.out_port]}, outputs={},
        )
        edges.append(Edge(t.id, t.out_port, next_id, 0))
        next_id += 1
    return Model(f"{model.name}_sub", nodes, edges)
