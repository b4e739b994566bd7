"""OpenVINO IR v10 writer: Model → .xml topology + .bin weights.

The inverse of ir/xml_parser.py — the reference has no serialization at all
(models come only from OpenVINO's Model Optimizer, reference:
convert-model.sh:1-12); this writer closes the loop so the framework can
export programmatically-built or trained models (ir/builder.py,
tools/mnist_train.py) and regenerate weight blobs for the stripped models
(models/.MISSING_LARGE_BLOBS).

Const layout policy: weights are packed in node-id order, 64-byte aligned
(TPU-friendly DMA alignment, and matches how Model Optimizer pads blobs).
The written XML roundtrips through parse_ir to an identical graph
(tests/test_writer.py).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir.model import Model, Node, TensorInfo

_DTYPE_TO_ELEMENT_TYPE = {
    np.dtype(np.float64): "f64",
    np.dtype(np.float32): "f32",
    np.dtype(np.float16): "f16",
    np.dtype(np.int64): "i64",
    np.dtype(np.int32): "i32",
    np.dtype(np.int16): "i16",
    np.dtype(np.int8): "i8",
    np.dtype(np.uint8): "u8",
    np.dtype(np.bool_): "boolean",
}

_DTYPE_TO_PRECISION = {
    np.dtype(np.float64): "FP64",
    np.dtype(np.float32): "FP32",
    np.dtype(np.float16): "FP16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}


def _ports_xml(parent, tag: str, ports: Dict[int, TensorInfo]):
    if not ports:
        return
    section = ET.SubElement(parent, tag)
    for pid in sorted(ports):
        info = ports[pid]
        attrs = {"id": str(pid), "precision": _DTYPE_TO_PRECISION[np.dtype(info.dtype)]}
        if info.names:
            attrs["names"] = ",".join(info.names)
        port = ET.SubElement(section, "port", attrs)
        for d in info.shape:
            ET.SubElement(port, "dim").text = str(int(d))


def _align(n: int, a: int = 64) -> int:
    return -(-n // a) * a


def _pack_const(node: Node, blob: bytearray) -> Dict[str, str]:
    if node.const is None:
        raise ValueError(f"Const {node.name!r} has no weights to serialize")
    arr = np.ascontiguousarray(node.const)
    # keep the declared on-disk dtype if the decoded array was upcast
    decl = node.outputs[node.out_port].dtype
    if np.dtype(decl) == np.float16 and arr.dtype == np.float32:
        arr = arr.astype(np.float16)
    offset = _align(len(blob))
    blob.extend(b"\x00" * (offset - len(blob)))
    raw = arr.tobytes()
    blob.extend(raw)
    return {
        "element_type": _DTYPE_TO_ELEMENT_TYPE[arr.dtype],
        "shape": ",".join(str(int(d)) for d in arr.shape),
        "offset": str(offset),
        "size": str(len(raw)),
    }


def _port_map_xml(parent, tag: str, sg):
    pm = ET.SubElement(parent, tag)
    for kind, entries in (("input", sg.inputs), ("output", sg.outputs)):
        for e in entries:
            a = {"external_port_id": str(e.external_port_id),
                 "internal_layer_id": str(e.internal_layer_id)}
            if e.axis is not None:
                a.update(axis=str(e.axis), start=str(e.start),
                         end=str(e.end), stride=str(e.stride),
                         part_size=str(e.part_size))
            if e.purpose:
                a["purpose"] = e.purpose
            ET.SubElement(pm, kind, a)


def _graph_xml(parent, model: Model, blob: bytearray):
    """Emit <layers>+<edges> of one graph into ``parent`` — recursing into
    TensorIterator/Loop/If bodies (nested <body>/<then_body>/<else_body>
    with port maps; body Consts pack into the same .bin)."""
    layers = ET.SubElement(parent, "layers")
    for nid in sorted(model.nodes):
        node = model.nodes[nid]
        layer = ET.SubElement(
            layers, "layer",
            {"id": str(node.id), "name": node.name, "type": node.op_type,
             "version": "opset1"},
        )
        attrs = dict(node.attrs)
        if node.op_type == "Const":
            attrs.update(_pack_const(node, blob))
        if attrs:
            ET.SubElement(layer, "data", {k: str(v) for k, v in attrs.items()})
        _ports_xml(layer, "input", node.inputs)
        _ports_xml(layer, "output", node.outputs)
        if node.subgraphs:
            if node.op_type == "If":
                for bname, pm_tag in (("then_body", "then_port_map"),
                                      ("else_body", "else_port_map")):
                    sg = node.subgraphs[bname]
                    _port_map_xml(layer, pm_tag, sg)
                    _graph_xml(ET.SubElement(layer, bname), sg.model, blob)
            else:
                sg = node.subgraphs["body"]
                _port_map_xml(layer, "port_map", sg)
                if sg.back_edges:
                    be = ET.SubElement(layer, "back_edges")
                    for frm, to in sg.back_edges:
                        ET.SubElement(be, "edge", {"from-layer": str(frm),
                                                   "to-layer": str(to)})
                _graph_xml(ET.SubElement(layer, "body"), sg.model, blob)

    edges = ET.SubElement(parent, "edges")
    for e in model.edges:
        ET.SubElement(edges, "edge", {
            "from-layer": str(e.src), "from-port": str(e.src_port),
            "to-layer": str(e.dst), "to-port": str(e.dst_port),
        })


def serialize_ir(model: Model) -> Tuple[bytes, bytes]:
    """Return (xml_bytes, bin_bytes)."""
    blob = bytearray()
    root = ET.Element("net", {"name": model.name, "version": "10"})
    _graph_xml(root, model, blob)
    ET.indent(root)
    xml_bytes = ET.tostring(root, encoding="utf-8", xml_declaration=True)
    return xml_bytes, bytes(blob)


def write_ir_model(model: Model, xml_path: str, bin_path: Optional[str] = None):
    if bin_path is None:
        # splitext, NOT rsplit('.'): a dotted directory name with an
        # extensionless filename ("/data/run.v2/mynet") must not place
        # the weights at "/data/run.bin" — and this matches how
        # read_ir_model derives the .bin path (ir/xml_parser.py)
        import os

        bin_path = os.path.splitext(xml_path)[0] + ".bin"
    xml_bytes, bin_bytes = serialize_ir(model)
    with open(xml_path, "wb") as f:
        f.write(xml_bytes)
    with open(bin_path, "wb") as f:
        f.write(bin_bytes)
