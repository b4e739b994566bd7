"""Failure-path contracts: malformed inputs must fail fast with clear,
actionable messages.

The reference's failure story is warn-then-`sys.exit(-1)` at run time
(inference_engine.py:62-71, :270-272); ours is validation at parse/load
time.  These tests pin the messages so error-path regressions (silent
acceptance, or an opaque stack trace from deep inside a pass) are
caught."""

import os

import numpy as np
import pytest

from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.ir.model import Edge, Model
from pyopenvino_tpu.runtime.compiler import compile_model

MNIST_XML = "/root/reference/models/mnist.xml"
MNIST_BIN = "/root/reference/models/mnist.bin"


def test_truncated_bin_names_offset_and_need(tmp_path):
    tb = tmp_path / "mnist.bin"
    tb.write_bytes(open(MNIST_BIN, "rb").read()[:1000])
    with pytest.raises(ValueError, match=r"offset.*bytes"):
        read_ir_model(MNIST_XML, str(tb))


def test_unknown_op_rejected_at_load_not_run(tmp_path):
    """check_nodes fails FAST and lists the offending types (the
    reference only prints a warning and dies mid-inference)."""
    from pyopenvino_tpu import IECore

    xml = tmp_path / "weird.xml"
    xml.write_text(
        open(MNIST_XML).read().replace('type="ReLU"', 'type="Gelu6"', 1)
    )
    ie = IECore()
    net = ie.read_network(str(xml), MNIST_BIN)  # parse itself succeeds
    with pytest.raises(ValueError, match="Gelu6"):
        ie.load_network(net, "TPU")


def test_missing_input_names_the_parameter():
    c = compile_model(read_ir_model(MNIST_XML, MNIST_BIN))
    with pytest.raises(KeyError, match="conv2d_input"):
        c.infer({"wrong_name": np.zeros((1, 1, 28, 28), np.float32)})


def test_cycle_rejected_at_graph_construction():
    m = read_ir_model(MNIST_XML, MNIST_BIN)
    e = m.edges[5]
    with pytest.raises(ValueError, match="cycle"):
        Model("cyc", m.nodes, list(m.edges) + [Edge(e.dst, 0, e.src, 99)])


def test_duplicate_input_edge_rejected():
    m = read_ir_model(MNIST_XML, MNIST_BIN)
    e = m.edges[5]
    with pytest.raises(ValueError, match="duplicate edge"):
        Model("dup", m.nodes,
              list(m.edges) + [Edge(e.src, e.src_port, e.dst, e.dst_port)])


def test_weightless_parse_ok_but_compile_fails_clearly():
    """A missing .bin yields a weightless structural model by design
    (inspection / weight synthesis); compiling one must name the cause,
    not die deep inside shape inference."""
    m = read_ir_model(MNIST_XML, "/nonexistent/never.bin")
    assert len(m.nodes) == 33  # structure parsed fine
    with pytest.raises(ValueError, match="weightless|without data"):
        compile_model(m)
