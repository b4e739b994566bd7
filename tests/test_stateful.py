"""Stateful inference: ReadValue/Assign variables + VariableState API.

The reference has no stateful support (no ReadValue/Assign plugin in
pyopenvino/op_plugins/); this is OpenVINO-runtime parity beyond it —
``InferRequest.query_state()`` / ``VariableState`` semantics, implemented
TPU-natively as a donated functional state pytree (ops/state_ops.py).
"""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


def accumulator_model(shape=(1, 4), init=None):
    """out = x + var;  var' = out   (a running sum across inferences)."""
    b = GraphBuilder("acc")
    x = b.parameter("x", shape)
    init_c = b.const(
        np.zeros(shape, np.float32) if init is None else init, name="init"
    )
    v = b.read_value(init_c, "acc_var", name="read")
    s = b.add(x, v, name="sum")
    b.assign(s, "acc_var", name="write")
    b.result(s, name="out")
    return b.build()


def ema_model(shape=(1, 3), alpha=0.25):
    """Exponential moving average: y = a*x + (1-a)*var; var' = y —
    the streaming low-latency pattern stateful OpenVINO models use."""
    b = GraphBuilder("ema")
    x = b.parameter("x", shape)
    init_c = b.const(np.zeros(shape, np.float32), name="init")
    v = b.read_value(init_c, "ema", name="read")
    ax = b.multiply(x, b.const(np.float32(alpha)), name="ax")
    av = b.multiply(v, b.const(np.float32(1 - alpha)), name="av")
    y = b.add(ax, av, name="y")
    b.assign(y, "ema", name="write")
    b.result(y, name="out")
    return b.build()


def test_interpreter_accumulates():
    it = Interpreter(accumulator_model())
    x = np.ones((1, 4), np.float32)
    for step in range(1, 4):
        out = it.run({"x": x})
        np.testing.assert_allclose(out["out"], step * x)
    it.reset_state()
    np.testing.assert_allclose(it.run({"x": x})["out"], x)


def test_compiled_accumulates_and_resets():
    net = compile_model(accumulator_model())
    assert set(net.variables) == {"acc_var"}
    x = np.ones((1, 4), np.float32)
    for step in range(1, 4):
        out = net.infer({"x": x})
        np.testing.assert_allclose(out["out"], step * x)
    net.reset_state()
    np.testing.assert_allclose(net.infer({"x": x})["out"], x)


def test_const_init_value_used():
    init = np.arange(4, dtype=np.float32).reshape(1, 4)
    net = compile_model(accumulator_model(init=init))
    x = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(net.infer({"x": x})["out"], init + 1)
    # interpreter twin agrees
    it = Interpreter(accumulator_model(init=init))
    np.testing.assert_allclose(it.run({"x": x})["out"], init + 1)


def test_differential_ema_sequence():
    """Compiled and interpreter twins agree across a stateful sequence."""
    rng = np.random.default_rng(0)
    seq = [rng.standard_normal((1, 3)).astype(np.float32) for _ in range(6)]
    model = ema_model()
    net = compile_model(model)
    it = Interpreter(ema_model())
    for x in seq:
        a = net.infer({"x": x})["out"]
        b = it.run({"x": x})["out"]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_query_and_set_state():
    net = compile_model(accumulator_model())
    x = np.full((1, 4), 2.0, np.float32)
    net.infer({"x": x})
    state = net.query_state()
    np.testing.assert_allclose(state["acc_var"], x)
    net.set_state({"acc_var": np.full((1, 4), 10.0, np.float32)})
    np.testing.assert_allclose(net.infer({"x": x})["out"], 12.0)
    with pytest.raises(KeyError):
        net.set_state({"nope": x})


def test_api_variable_state():
    from pyopenvino_tpu.api import IECore, IENetwork

    net = IENetwork(accumulator_model())
    exe = IECore().load_network(net, "TPU")
    req = exe.requests[0]
    x = np.ones((1, 4), np.float32)
    req.infer({"x": x})
    req.infer({"x": x})
    states = req.query_state()
    assert [s.name for s in states] == ["acc_var"]
    np.testing.assert_allclose(states[0].state, 2 * x)
    states[0].state = np.zeros((1, 4), np.float32)
    np.testing.assert_allclose(req.infer({"x": x})["out"], x)
    states[0].reset()
    np.testing.assert_allclose(req.infer({"x": x})["out"], x)


def test_api_interpreter_backend_state():
    from pyopenvino_tpu.api import IECore, IENetwork

    exe = IECore().load_network(IENetwork(accumulator_model()), "CPU")
    x = np.ones((1, 4), np.float32)
    exe.infer({"x": x})
    exe.infer({"x": x})
    np.testing.assert_allclose(exe.query_state()[0].state, 2 * x)
    exe.reset_state()
    np.testing.assert_allclose(exe.query_state()[0].state, 0 * x)


def test_readonly_variable_passes_through():
    """ReadValue with no Assign: state survives unchanged (aliased)."""
    b = GraphBuilder("ro")
    x = b.parameter("x", (1, 4))
    v = b.read_value(b.const(np.full((1, 4), 3.0, np.float32)), "bias")
    b.result(b.add(x, v), name="out")
    net = compile_model(b.build())
    xin = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(net.infer({"x": xin})["out"], 4.0)
    np.testing.assert_allclose(net.infer({"x": xin})["out"], 4.0)
    np.testing.assert_allclose(net.query_state()["bias"], 3.0)


def test_stateful_guards():
    net = compile_model(accumulator_model())
    with pytest.raises(NotImplementedError):
        net.batched_fn(4)
    with pytest.raises(NotImplementedError):
        net.export("/tmp/should_not_exist.ovtpu")


def test_verify_against_interpreter_stateful():
    net = compile_model(ema_model())
    x = np.ones((1, 3), np.float32)
    diffs = net.verify_against_interpreter({"x": x})
    assert diffs  # at least one traced layer compared


def test_assign_subgraph_not_pruned():
    """A subgraph reaching only an Assign sink is live (passes/util.py)."""
    from pyopenvino_tpu.passes.util import prune_dead_nodes

    b = GraphBuilder("p")
    x = b.parameter("x", (1, 4))
    v = b.read_value(b.const(np.zeros((1, 4), np.float32)), "m")
    # result path ignores the state; assign path scales x
    b.result(b.add(x, v), name="out")
    b.assign(b.multiply(x, b.const(np.float32(2.0))), "m")
    model, dropped = prune_dead_nodes(b.build())
    assert dropped == 0
    net = compile_model(model)
    xin = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(net.infer({"x": xin})["out"], 1.0)
    np.testing.assert_allclose(net.infer({"x": xin})["out"], 3.0)


def test_ir_roundtrip_stateful(tmp_path):
    """variable_id survives writer → parser; the reloaded model is
    stateful and numerically identical."""
    from pyopenvino_tpu.ir.writer import write_ir_model
    from pyopenvino_tpu.ir.xml_parser import read_ir_model

    model = accumulator_model()
    write_ir_model(model, str(tmp_path / "acc.xml"), str(tmp_path / "acc.bin"))
    re = read_ir_model(str(tmp_path / "acc.xml"), str(tmp_path / "acc.bin"))
    net = compile_model(re)
    x = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(net.infer({"x": x})["out"], x)
    np.testing.assert_allclose(net.infer({"x": x})["out"], 2 * x)
