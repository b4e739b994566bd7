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


def serialize_ir(model: Model) -> Tuple[bytes, bytes]:
    """Return (xml_bytes, bin_bytes)."""
    # 1. pack consts, assigning offset/size attrs
    blob = bytearray()
    const_attrs: Dict[int, Dict[str, str]] = {}
    for node in sorted(model.nodes.values(), key=lambda n: n.id):
        if node.op_type != "Const":
            continue
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
        const_attrs[node.id] = {
            "element_type": _DTYPE_TO_ELEMENT_TYPE[arr.dtype],
            "shape": ",".join(str(int(d)) for d in arr.shape),
            "offset": str(offset),
            "size": str(len(raw)),
        }

    # 2. topology
    root = ET.Element("net", {"name": model.name, "version": "10"})
    layers = ET.SubElement(root, "layers")
    for nid in sorted(model.nodes):
        node = model.nodes[nid]
        layer = ET.SubElement(
            layers, "layer",
            {"id": str(node.id), "name": node.name, "type": node.op_type,
             "version": "opset1"},
        )
        attrs = dict(node.attrs)
        if node.id in const_attrs:
            attrs.update(const_attrs[node.id])
        if attrs:
            ET.SubElement(layer, "data", {k: str(v) for k, v in attrs.items()})
        _ports_xml(layer, "input", node.inputs)
        _ports_xml(layer, "output", node.outputs)

    edges = ET.SubElement(root, "edges")
    for e in model.edges:
        ET.SubElement(edges, "edge", {
            "from-layer": str(e.src), "from-port": str(e.src_port),
            "to-layer": str(e.dst), "to-port": str(e.dst_port),
        })

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
