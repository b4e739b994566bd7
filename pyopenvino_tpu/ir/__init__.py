from pyopenvino_tpu.ir.model import Model, Node, Edge, TensorInfo
from pyopenvino_tpu.ir.xml_parser import parse_ir, read_ir_model

__all__ = ["Model", "Node", "Edge", "TensorInfo", "parse_ir", "read_ir_model"]
