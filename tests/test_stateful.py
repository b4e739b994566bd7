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
    # export of stateful networks is now supported —
    # tests/test_export.py::test_stateful_export_roundtrip


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


def dynamic_init_model(shape=(1, 4)):
    """Input-dependent init subgraph (legal OpenVINO IR, NOT statically
    foldable): var initializes to 2*x at the FIRST infer after a reset,
    then var' = var + x each step."""
    b = GraphBuilder("dyn")
    x = b.parameter("x", shape)
    init = b.multiply(x, b.const(np.float32(2.0)), name="init2x")
    v = b.read_value(init, "m", name="read")
    s = b.add(v, x, name="s")
    b.assign(s, "m", name="write")
    b.result(s, name="out")
    return b.build()


def test_dynamic_init_interpreter_vs_compiled():
    """The compiled path threads the TRACED init through a fresh flag so
    both executors capture the first-infer init (ops/state_ops.py)."""
    rng = np.random.default_rng(1)
    seq = [rng.standard_normal((1, 4)).astype(np.float32) for _ in range(4)]
    net = compile_model(dynamic_init_model())
    assert net.variables["m"]["dynamic_init"]
    it = Interpreter(dynamic_init_model())
    for x in seq:
        a = net.infer({"x": x})["out"]
        b = it.run({"x": x})["out"]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # first step: out = 2*x0 + x0
    # reset → the NEXT input re-seeds the variable
    net.reset_state()
    it.reset_state()
    x = seq[2]
    np.testing.assert_allclose(net.infer({"x": x})["out"], 3 * x, rtol=1e-4)
    np.testing.assert_allclose(it.run({"x": x})["out"], 3 * x, rtol=1e-5)


def test_dynamic_init_set_state_wins():
    """An explicit set_state beats the init subgraph (fresh flag cleared)."""
    net = compile_model(dynamic_init_model())
    override = np.full((1, 4), 10.0, np.float32)
    net.set_state({"m": override})
    x = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(net.infer({"x": x})["out"], 11.0)


def test_dynamic_init_reset_variable_rearms():
    net = compile_model(dynamic_init_model())
    x1 = np.ones((1, 4), np.float32)
    net.infer({"x": x1})  # var = 3
    net.reset_variable("m")  # re-arm: next infer recomputes init
    x2 = np.full((1, 4), 2.0, np.float32)
    np.testing.assert_allclose(net.infer({"x": x2})["out"], 6.0)  # 2*2+2
    with pytest.raises(KeyError):
        net.reset_variable("nope")
    # interpreter twin
    it = Interpreter(dynamic_init_model())
    it.run({"x": x1})
    it.reset_variable("m")
    np.testing.assert_allclose(it.run({"x": x2})["out"], 6.0)


def test_per_request_state_isolated():
    """Each InferRequest owns its variable state (OpenVINO scopes state
    per request) — two slots advance independently."""
    from pyopenvino_tpu.api import IECore, IENetwork

    exe = IECore().load_network(
        IENetwork(accumulator_model()), "TPU", num_requests=2
    )
    r0, r1 = exe.requests
    x = np.ones((1, 4), np.float32)
    np.testing.assert_allclose(r0.infer({"x": x})["out"], 1.0)
    np.testing.assert_allclose(r0.infer({"x": x})["out"], 2.0)
    # r1 starts from ITS OWN fresh state, unaffected by r0's two steps
    np.testing.assert_allclose(r1.infer({"x": x})["out"], 1.0)
    np.testing.assert_allclose(r0.query_state()[0].state, 2 * x)
    np.testing.assert_allclose(r1.query_state()[0].state, 1 * x)
    r0.reset_state()
    np.testing.assert_allclose(r0.infer({"x": x})["out"], 1.0)
    np.testing.assert_allclose(r1.infer({"x": x})["out"], 2.0)


def test_per_request_state_concurrent_no_corruption():
    """Concurrent stateful requests never share donated buffers: N slots
    stepped from N threads each see exactly their own running sum."""
    import threading

    from pyopenvino_tpu.api import IECore, IENetwork

    exe = IECore().load_network(
        IENetwork(accumulator_model()), "TPU", num_requests=4
    )
    reqs = exe.requests
    exe._get_compiled()  # compile once up front; threads then only execute
    steps = 8
    errs = []

    def drive(i):
        try:
            x = np.full((1, 4), float(i + 1), np.float32)
            for step in range(1, steps + 1):
                out = reqs[i].infer({"x": x})["out"]
                np.testing.assert_allclose(out, step * (i + 1))
        except Exception as e:  # surfaced below
            errs.append(e)

    threads = [threading.Thread(target=drive, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs


def test_async_queue_stateful_inline():
    """AsyncInferQueue on a stateful network runs inline on each slot's
    private stream (never through the coalescing server)."""
    from pyopenvino_tpu.api import AsyncInferQueue, IECore, IENetwork

    exe = IECore().load_network(IENetwork(accumulator_model()), "TPU")
    queue = AsyncInferQueue(exe, jobs=1)  # one slot → one sequential stream
    seen = []
    queue.set_callback(
        lambda req, userdata: seen.append((userdata, req.output_blobs["out"]))
    )
    x = np.ones((1, 4), np.float32)
    for i in range(3):
        queue.start_async({"x": x}, userdata=i)
    queue.wait_all()
    assert [u for u, _ in seen] == [0, 1, 2]
    for i, (_, out) in enumerate(seen, start=1):
        np.testing.assert_allclose(out, i * x)


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


def test_batch_baked_stateful_lockstep_parity():
    """VERDICT's documented escape hatch, proven: IENetwork.reshape bakes
    the batch into a stateful IR; N streams then run in lockstep with the
    variable's steady state at the ASSIGNED (batched) shape and the init
    broadcast across streams (ops/state_ops.py model_variables).  Parity:
    row i of the lockstep run == stream i run alone, compiled AND
    interpreter."""
    from pyopenvino_tpu.api import IECore

    N, steps = 4, 3
    rng = np.random.default_rng(7)
    xs = rng.standard_normal((steps, N, 3)).astype(np.float32)

    from pyopenvino_tpu.passes.shape_infer import reshape_model

    batched = reshape_model(ema_model(), {"x": (N, 3)})
    net = compile_model(batched)
    assert net.variables["ema"]["shape"] == (N, 3)
    lockstep = [net.infer({"x": xs[t]})["out"] for t in range(steps)]

    for i in range(N):
        single = compile_model(ema_model())
        for t in range(steps):
            out = single.infer({"x": xs[t, i:i + 1]})["out"]
            np.testing.assert_allclose(
                lockstep[t][i:i + 1], out, rtol=1e-5, atol=1e-6
            )

    # interpreter twin agrees on the batched graph
    it = Interpreter(reshape_model(ema_model(), {"x": (N, 3)}))
    for t in range(steps):
        np.testing.assert_allclose(
            it.run({"x": xs[t]})["out"], lockstep[t], rtol=1e-5, atol=1e-6
        )

    # and the public-API route: IENetwork.reshape -> load_network
    ie = IECore()
    from pyopenvino_tpu.api import IENetwork

    api_net = IENetwork(ema_model()).reshape({"x": (N, 3)})
    exe = ie.load_network(api_net, "TPU")
    for t in range(steps):
        np.testing.assert_allclose(
            exe.infer({"x": xs[t]})["out"], lockstep[t], rtol=1e-5, atol=1e-5
        )


def test_batch_baked_dynamic_init():
    """A batch-baked DYNAMIC-init variable captures the batched traced
    init on the first infer (broadcast_to in _build_fn), matching N
    independent single-stream runs."""
    from pyopenvino_tpu.passes.shape_infer import reshape_model

    N = 3
    rng = np.random.default_rng(9)
    xs = rng.standard_normal((2, N, 4)).astype(np.float32)
    net = compile_model(reshape_model(dynamic_init_model(), {"x": (N, 4)}))
    lock = [net.infer({"x": xs[t]})["out"] for t in range(2)]
    for i in range(N):
        single = compile_model(dynamic_init_model())
        for t in range(2):
            out = single.infer({"x": xs[t, i:i + 1]})["out"]
            np.testing.assert_allclose(lock[t][i:i + 1], out, rtol=1e-5,
                                       atol=1e-6)


def test_assign_shape_mismatch_fails_fast():
    """An Assign whose shape is NOT a broadcast of the ReadValue shape is
    a model error, refused at compile with a named variable."""
    b = GraphBuilder("bad")
    x = b.parameter("x", (2, 3))
    v = b.read_value(b.const(np.zeros((4, 3), np.float32)), "v", name="r")
    s = b.add(x, b.const(np.zeros((2, 3), np.float32)), name="s")
    b.assign(s, "v", name="w")
    b.result(b.add(v, b.const(np.zeros((4, 3), np.float32)), name="o2"),
             name="out")
    with pytest.raises(ValueError, match="not a broadcast"):
        compile_model(b.build())


def _delay_line_model():
    """Assign topologically BEFORE its ReadValue (the Assign input does
    not consume the ReadValue output): out = v (dynamic init 2x),
    v' = 3x.  The hazard topology for the staged-state-merge fix in
    _build_fn — a direct new_state write from the later ReadValue
    dynamic-init commit used to clobber the earlier Assign."""
    b = GraphBuilder("delay")
    x = b.parameter("x", (1, 4))
    three = b.multiply(x, b.const(np.float32(3.0)), name="a3")
    b.assign(three, "v", name="write")
    init = b.multiply(x, b.const(np.float32(2.0)), name="init2x")
    v = b.read_value(init, "v", name="read")
    b.result(b.add(v, b.const(np.zeros((1, 4), np.float32)), name="o"),
             name="out")
    return b.build()


def test_assign_emitted_before_readvalue_not_clobbered():
    m = _delay_line_model()
    order = [n.op_type for n in m]
    assert order.index("Assign") < order.index("ReadValue")  # the hazard
    net = compile_model(_delay_line_model())
    it = Interpreter(_delay_line_model())
    rng = np.random.default_rng(3)
    xs = [rng.standard_normal((1, 4)).astype(np.float32) for _ in range(3)]
    for i, x in enumerate(xs):
        got = net.infer({"x": x})["out"]
        want = it.run({"x": x})["out"]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {i}")
    # semantics: step0 reads the dynamic init (2*x0); step k>0 reads the
    # PREVIOUS step's assignment (3*x_{k-1})
    np.testing.assert_allclose(
        net.infer({"x": xs[0]})["out"], 3 * xs[2], rtol=1e-5)
