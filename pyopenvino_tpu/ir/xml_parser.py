"""OpenVINO IR v10 front-end: .xml topology + .bin weights → Model.

Parity with the reference loader (reference:
pyopenvino/inference_engine.py:105-199):
  * <layers>: id/name/type + <data> attrs + per-port dims/precision/names
  * <edges>: from-layer/from-port/to-layer/to-port quadruples
  * Const decode: .bin sliced by offset/size, dtype from element_type,
    reshaped to the declared shape.  Decoded once at load time with
    np.frombuffer (zero-copy), not struct.unpack per inference
    (the reference re-decodes every run — Const.py:11-14).

Deliberate fixes over the reference:
  * read_network honours its `weights` argument (the reference derives the
    .bin path from the .xml basename and ignores `weights`,
    inference_engine.py:105-110).
  * missing-weight models load with const=None so structural tooling works.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir.model import (
    ELEMENT_TYPE_TO_DTYPE,
    PRECISION_TO_DTYPE,
    Edge,
    Model,
    Node,
    TensorInfo,
)


def _parse_ports(section) -> Dict[int, TensorInfo]:
    ports: Dict[int, TensorInfo] = {}
    if section is None:
        return ports
    for port in section.findall("port"):
        pid = int(port.attrib["id"])
        dims = tuple(int(d.text) for d in port.findall("dim"))
        prec = port.attrib.get("precision", "FP32")
        names = tuple(
            t.strip() for t in port.attrib.get("names", "").split(",") if t.strip()
        )
        ports[pid] = TensorInfo(
            shape=dims, dtype=np.dtype(PRECISION_TO_DTYPE[prec]), names=names
        )
    return ports


def _decode_const(attrs: Dict[str, str], blob: Optional[bytes]) -> Optional[np.ndarray]:
    if blob is None or "offset" not in attrs:
        return None
    offset = int(attrs["offset"])
    size = int(attrs["size"])
    dtype = np.dtype(ELEMENT_TYPE_TO_DTYPE[attrs["element_type"]])
    shape = tuple(
        int(t) for t in attrs.get("shape", "").split(",") if t.strip()
    )
    raw = blob[offset : offset + size]
    if len(raw) != size:
        raise ValueError(
            f"const at offset {offset} wants {size} bytes, "
            f".bin has only {len(raw)} past that offset"
        )
    arr = np.frombuffer(raw, dtype=dtype)
    if dtype == np.float16:
        # fp16 weights decode once to fp32 through the native threaded
        # decoder (bit-exact, tests/test_native.py covers all 65536
        # patterns); the reference struct.unpacks per inference
        # (inference_engine.py:188-199).
        from pyopenvino_tpu import native

        arr = native.fp16_to_fp32(arr)
    return arr.reshape(shape) if shape else arr.reshape(())


def _parse_port_map(section) -> Tuple[list, list]:
    """<port_map> → (input entries, output entries) (ir/subgraph.py)."""
    from pyopenvino_tpu.ir.subgraph import PortMapEntry

    ins, outs = [], []
    if section is None:
        return ins, outs
    for tag, dest in (("input", ins), ("output", outs)):
        for el in section.findall(tag):
            a = el.attrib
            dest.append(PortMapEntry(
                external_port_id=int(a.get("external_port_id", -1)),
                internal_layer_id=int(a["internal_layer_id"]),
                axis=int(a["axis"]) if "axis" in a else None,
                start=int(a.get("start", 0)),
                end=int(a.get("end", -1)),
                stride=int(a.get("stride", 1)),
                part_size=int(a.get("part_size", 1)),
                purpose=a.get("purpose", ""),
            ))
    return ins, outs


def _parse_subgraphs(layer, op_type: str, blob: Optional[bytes]):
    """Nested <body>/<then_body>/<else_body> + port maps + back edges for
    TensorIterator / Loop / If layers."""
    from pyopenvino_tpu.ir.subgraph import SubGraph

    def body_from(body_tag: str, pm_tag: str) -> Optional[SubGraph]:
        body_el = layer.find(body_tag)
        if body_el is None:
            return None
        model = _parse_graph(
            body_el, blob, f"{layer.attrib.get('name', '?')}/{body_tag}")
        ins, outs = _parse_port_map(layer.find(pm_tag))
        back = []
        be_el = layer.find("back_edges")
        if be_el is not None and body_tag == "body":
            for e in be_el.findall("edge"):
                back.append((int(e.attrib["from-layer"]),
                             int(e.attrib["to-layer"])))
        sg = SubGraph(model=model, inputs=ins, outputs=outs, back_edges=back)
        sg.validate(f"{op_type} {layer.attrib.get('name', '?')} {body_tag}")
        return sg

    if op_type in ("TensorIterator", "Loop"):
        sg = body_from("body", "port_map")
        if sg is None:
            raise ValueError(f"{op_type} layer has no <body>")
        return {"body": sg}
    subs = {}
    for tag, pm in (("then_body", "then_port_map"),
                    ("else_body", "else_port_map")):
        sg = body_from(tag, pm)
        if sg is None:
            raise ValueError(f"If layer has no <{tag}>")
        subs[tag] = sg
    return subs


def _parse_graph(root, blob: Optional[bytes], net_name: str) -> Model:
    """Parse one <net>/<body> element (layers + edges) into a Model —
    shared by the top level and nested subgraph bodies."""
    layers = root.find("layers")
    if layers is None:
        raise ValueError("IR file has no <layers> section")
    nodes: Dict[int, Node] = {}
    for layer in layers.findall("layer"):
        nid = int(layer.attrib["id"])
        if nid in nodes:
            raise ValueError(f"duplicate layer id {nid} in IR")
        op_type = layer.attrib["type"]
        data = layer.find("data")
        attrs = dict(data.attrib) if data is not None else {}
        # retain the opset version for version-sensitive ops (e.g.
        # GatherND's opset5 flattened-batch output layout)
        if "version" in layer.attrib:
            attrs.setdefault("_opset", layer.attrib["version"])
        node = Node(
            id=nid,
            name=layer.attrib.get("name", str(nid)),
            op_type=op_type,
            attrs=attrs,
            inputs=_parse_ports(layer.find("input")),
            outputs=_parse_ports(layer.find("output")),
            const=_decode_const(attrs, blob) if op_type == "Const" else None,
            subgraphs=(
                _parse_subgraphs(layer, op_type, blob)
                if op_type in ("TensorIterator", "Loop", "If") else None
            ),
        )
        nodes[nid] = node

    edges: List[Edge] = []
    edges_el = root.find("edges")
    if edges_el is not None:
        for e in edges_el.findall("edge"):
            edges.append(
                Edge(
                    src=int(e.attrib["from-layer"]),
                    src_port=int(e.attrib["from-port"]),
                    dst=int(e.attrib["to-layer"]),
                    dst_port=int(e.attrib["to-port"]),
                )
            )

    return Model(net_name, nodes, edges)


def parse_ir(xml_text: str, blob: Optional[bytes], name: Optional[str] = None) -> Model:
    root = ET.fromstring(xml_text)
    if root.tag != "net":
        raise ValueError(f"not an OpenVINO IR file (root tag {root.tag!r})")
    net_name = name or root.attrib.get("name", "net")
    return _parse_graph(root, blob, net_name)


def read_ir_model(model_path: str, weights_path: Optional[str] = None) -> Model:
    """Load IR from files.  `weights_path` defaults to the .xml basename with
    a .bin suffix; a missing .bin yields a weightless structural model."""
    if weights_path is None:
        weights_path = os.path.splitext(model_path)[0] + ".bin"
    with open(model_path, "r", encoding="utf-8") as f:
        xml_text = f.read()
    blob = None
    if os.path.exists(weights_path):
        with open(weights_path, "rb") as f:
            blob = f.read()
    name = os.path.splitext(os.path.basename(model_path))[0]
    return parse_ir(xml_text, blob, name=name)
