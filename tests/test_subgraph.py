"""TensorIterator / Loop / If subgraph ops (ops/subgraph.py).

The reference's documented MO pipeline emits TensorIterator for every
TF/ONNX sequence model (reference: convert-model.sh:1-12) but its engine
has no subgraph support (inference_engine.py:270-272).  Covered here:
interpreter↔XLA parity, golden semantics, forward/reverse slicing,
part_size chunks, Loop static/dynamic trip counts, If branches, writer→
parser round-trips, body weights in the device pytree, vmap batching,
and the fail-fast refusals."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter

RNG = np.random.default_rng(7)
I, H, T, B = 6, 10, 5, 2


def _rnn_body(W, R, bias, b=B):
    bb = GraphBuilder("body")
    xt = bb.parameter("x_t", (b, 1, I))
    h = bb.parameter("h_in", (b, H))
    xf = bb.reshape(xt, (b, I))
    z = bb.add(bb.add(bb.matmul(xf, bb.const(W)),
                      bb.matmul(h, bb.const(R))), bb.const(bias))
    h2 = bb.unary("Tanh", z)
    bb.result(h2, "h_out")
    bb.result(bb.reshape(h2, (b, 1, H)), "y_out")
    return bb.build()


def _weights():
    W = RNG.standard_normal((I, H)).astype(np.float32) * 0.3
    R = RNG.standard_normal((H, H)).astype(np.float32) * 0.3
    bias = RNG.standard_normal((1, H)).astype(np.float32) * 0.1
    return W, R, bias


def _ti_model(W, R, bias, reverse=False, b=B):
    sl = ({"axis": 1, "start": -1, "end": 0, "stride": -1} if reverse
          else {"axis": 1})
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (b, T, I))
    h0 = gb.parameter("h0", (b, H))
    outs = gb.tensor_iterator(
        [x, h0], _rnn_body(W, R, bias, b),
        input_map=[("x_t", sl), "h_in"],
        output_map=[("y_out", sl), "h_out"],
        back_edges=[("h_out", "h_in")])
    gb.result(outs[0], "Y")
    gb.result(outs[1], "H_last")
    return gb.build()


def _golden_rnn(x, h0, W, R, bias, reverse=False):
    hh = h0
    ys = [None] * x.shape[1]
    order = range(x.shape[1] - 1, -1, -1) if reverse else range(x.shape[1])
    for t in order:
        hh = np.tanh(x[:, t] @ W + hh @ R + bias)
        ys[t] = hh[:, None]
    return np.concatenate(ys, 1), hh


def _feed(b=B):
    return {"x": RNG.standard_normal((b, T, I)).astype(np.float32),
            "h0": RNG.standard_normal((b, H)).astype(np.float32)}


@pytest.mark.parametrize("reverse", [False, True])
def test_tensor_iterator_rnn_golden_and_parity(reverse):
    W, R, bias = _weights()
    m = _ti_model(W, R, bias, reverse)
    feed = _feed()
    ref = Interpreter(m).run(feed)
    want_y, want_h = _golden_rnn(feed["x"], feed["h0"], W, R, bias, reverse)
    np.testing.assert_allclose(ref["Y"], want_y, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref["H_last"], want_h, rtol=1e-5, atol=1e-5)
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    np.testing.assert_allclose(got["Y"], ref["Y"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["H_last"], ref["H_last"],
                               rtol=1e-4, atol=1e-4)


def test_tensor_iterator_part_size_chunks():
    """part_size=2 with stride=2: the body consumes 2-wide chunks and the
    concat output reassembles them in order."""
    bb = GraphBuilder("chunkbody")
    xt = bb.parameter("x_t", (B, 2, I))
    bb.result(bb.multiply(xt, bb.const(np.float32(2.0).reshape(()))), "y")
    body = bb.build()
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (B, 6, I))
    y = gb.tensor_iterator(
        [x], body,
        input_map=[("x_t", {"axis": 1, "part_size": 2, "stride": 2})],
        output_map=[("y", {"axis": 1, "part_size": 2, "stride": 2})])
    gb.result(y, "out")
    m = gb.build()
    feed = {"x": RNG.standard_normal((B, 6, I)).astype(np.float32)}
    ref = Interpreter(m).run(feed)
    np.testing.assert_allclose(ref["out"], feed["x"] * 2, rtol=1e-6)
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    np.testing.assert_allclose(got["out"], ref["out"], rtol=1e-4, atol=1e-5)


def test_tensor_iterator_body_weights_in_pytree():
    """Body Const weights are device pytree params, not baked literals."""
    W, R, bias = _weights()
    net = compile_model(_ti_model(W, R, bias), Config(backend=Backend.XLA))
    sub_keys = [k for k in net.weights if k.startswith("sub.")]
    assert len(sub_keys) == 3, sub_keys  # W, R, bias
    total = sum(int(np.prod(net.weights[k].shape)) for k in sub_keys)
    assert total == W.size + R.size + bias.size


def test_tensor_iterator_batched_vmap():
    """TI under the serving batch path (vmap over the declared graph)."""
    W, R, bias = _weights()
    m = _ti_model(W, R, bias, b=1)
    net = compile_model(m, Config(backend=Backend.XLA))
    xs = RNG.standard_normal((4, 1, T, I)).astype(np.float32)
    h0s = RNG.standard_normal((4, 1, H)).astype(np.float32)
    out = net.infer_batch({"x": xs, "h0": h0s})
    for i in range(4):
        want_y, _ = _golden_rnn(xs[i], h0s[i], W, R, bias)
        np.testing.assert_allclose(
            np.asarray(out["Y"][i]), want_y[0], rtol=1e-3, atol=1e-3)


def _loop_counter_model(tc_value, concat=False):
    bb = GraphBuilder("lbody")
    s = bb.parameter("s_in", (B, H))
    inc = bb.parameter("inc", (B, H))
    s2 = bb.add(s, inc)
    bb.result(s2, "s_out")
    bb.result(bb.const(np.asarray(True).reshape(())), "cond")
    body = bb.build()
    gb = GraphBuilder("outer")
    tc = gb.const(np.asarray(tc_value, np.int64).reshape(()))
    ec = gb.const(np.asarray(True).reshape(()))
    s0 = gb.parameter("s0", (B, H))
    i0 = gb.parameter("inc0", (B, H))
    out = gb.loop(tc, ec, [s0, i0], body,
                  input_map=["s_in", "inc"], output_map=["s_out"],
                  back_edges=[("s_out", "s_in")], condition_result="cond")
    gb.result(out, "final")
    return gb.build()


def test_loop_static_trip_count():
    m = _loop_counter_model(5)
    feed = {"s0": RNG.standard_normal((B, H)).astype(np.float32),
            "inc0": RNG.standard_normal((B, H)).astype(np.float32)}
    ref = Interpreter(m).run(feed)
    np.testing.assert_allclose(ref["final"], feed["s0"] + 5 * feed["inc0"],
                               rtol=1e-5, atol=1e-5)
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    np.testing.assert_allclose(got["final"], ref["final"],
                               rtol=1e-4, atol=1e-4)


def test_loop_runs_until_condition():
    """trip_count=-1: body condition controls termination (bounded-free
    while_loop on the compiled path)."""
    bb = GraphBuilder("lbody")
    s = bb.parameter("s_in", (1, 1))
    s2 = bb.add(s, bb.const(np.ones((1, 1), np.float32)))
    bb.result(s2, "s_out")
    # keep iterating while s2 < 7
    c = bb._add_node("Less", [s2, bb.const(np.full((1, 1), 7.0, np.float32))],
                     {}, out_dtype=np.bool_)
    bb.result(bb.reshape(c, ()), "cond")
    body = bb.build()
    gb = GraphBuilder("outer")
    tc = gb.const(np.asarray(-1, np.int64).reshape(()))
    ec = gb.const(np.asarray(True).reshape(()))
    s0 = gb.parameter("s0", (1, 1))
    out = gb.loop(tc, ec, [s0], body, input_map=["s_in"],
                  output_map=["s_out"], back_edges=[("s_out", "s_in")],
                  condition_result="cond")
    gb.result(out, "final")
    m = gb.build()
    feed = {"s0": np.zeros((1, 1), np.float32)}
    ref = Interpreter(m).run(feed)
    # 0→1→…→7 : first value NOT < 7 stops AFTER producing 7
    np.testing.assert_allclose(ref["final"], [[7.0]])
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    np.testing.assert_allclose(got["final"], ref["final"], rtol=1e-5)


def test_loop_current_iteration_and_concat():
    """Body receives the iteration index; concat output stacks per-step
    results at the declared trip count."""
    n = 4
    bb = GraphBuilder("lbody")
    it = bb.parameter("iter", (), dtype=np.int32)
    x = bb.parameter("x_in", (1, 3))
    itf = bb._add_node("Convert", [it], {"destination_type": "f32"},
                       out_dtype=np.float32)
    y = bb.add(x, bb.reshape(itf, (1, 1)))
    bb.result(bb.reshape(y, (1, 1, 3)), "y_step")
    bb.result(bb.const(np.asarray(True).reshape(())), "cond")
    body = bb.build()
    gb = GraphBuilder("outer")
    tc = gb.const(np.asarray(n, np.int64).reshape(()))
    ec = gb.const(np.asarray(True).reshape(()))
    x0 = gb.parameter("x", (1, 3))
    out = gb.loop(tc, ec, [x0], body, input_map=["x_in"],
                  output_map=[("y_step", {"axis": 1})],
                  current_iteration="iter", condition_result="cond")
    gb.result(out, "ys")
    m = gb.build()
    feed = {"x": np.ones((1, 3), np.float32)}
    ref = Interpreter(m).run(feed)
    want = np.stack([np.ones((1, 3)) + i for i in range(n)], axis=1)
    np.testing.assert_allclose(ref["ys"], want.astype(np.float32))
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    np.testing.assert_allclose(got["ys"], ref["ys"], rtol=1e-4, atol=1e-5)


def _if_model():
    tb = GraphBuilder("then")
    xp = tb.parameter("xa", (B, H))
    tb.result(tb.relu(xp), "r")
    eb = GraphBuilder("else")
    xq = eb.parameter("xb", (B, H))
    eb.result(eb.unary("Negative", xq), "r")
    gb = GraphBuilder("ifnet")
    cond = gb.parameter("c", (), dtype=np.bool_)
    xv = gb.parameter("x", (B, H))
    y = gb.if_op(cond, [xv], tb.build(), eb.build(),
                 ["xa"], ["xb"], ["r"], ["r"])
    gb.result(y, "out")
    return gb.build()


@pytest.mark.parametrize("cv", [True, False])
def test_if_branches(cv):
    m = _if_model()
    xval = RNG.standard_normal((B, H)).astype(np.float32)
    feed = {"c": np.asarray(cv), "x": xval}
    ref = Interpreter(m).run(feed)
    want = np.maximum(xval, 0) if cv else -xval
    np.testing.assert_allclose(ref["out"], want, rtol=1e-5, atol=1e-6)
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    np.testing.assert_allclose(got["out"], ref["out"], rtol=1e-4, atol=1e-5)


def test_subgraph_ir_round_trip(tmp_path):
    """TI and If serialize to IR XML (<body>/<port_map>/<back_edges>) and
    parse back to numerically identical models."""
    from pyopenvino_tpu.ir.writer import write_ir_model
    from pyopenvino_tpu.ir.xml_parser import read_ir_model

    W, R, bias = _weights()
    for m, feed in ((_ti_model(W, R, bias), _feed()),
                    (_if_model(), {"c": np.asarray(True),
                                   "x": RNG.standard_normal(
                                       (B, H)).astype(np.float32)})):
        path = str(tmp_path / f"{m.name}.xml")
        write_ir_model(m, path)
        m2 = read_ir_model(path)
        ref = Interpreter(m).run(feed)
        ref2 = Interpreter(m2).run(feed)
        for k in ref:
            np.testing.assert_allclose(ref2[k], ref[k], rtol=1e-6)
        got = compile_model(m2, Config(backend=Backend.XLA))(feed)
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4)


# -- fail-fast refusals --------------------------------------------------------


def test_body_with_state_ops_refused():
    bb = GraphBuilder("badbody")
    xt = bb.parameter("x_t", (B, 1, I))
    rv = bb.read_value(bb.reshape(xt, (B, I)), "v0")
    bb.result(rv, "y")
    body = bb.build()
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (B, T, I))
    with pytest.raises(NotImplementedError, match="ReadValue"):
        gb.tensor_iterator([x], body,
                           input_map=[("x_t", {"axis": 1})],
                           output_map=[("y", {"axis": 1})])


def test_unmapped_body_parameter_refused():
    bb = GraphBuilder("body")
    xt = bb.parameter("x_t", (B, 1, I))
    other = bb.parameter("dangling", (B, H))
    bb.result(bb.reshape(xt, (B, I)), "y")
    bb.result(other, "z")
    body = bb.build()
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (B, T, I))
    with pytest.raises(ValueError, match="dangling"):
        gb.tensor_iterator([x], body,
                           input_map=[("x_t", {"axis": 1})],
                           output_map=["y"])


def test_bad_part_size_refused():
    bb = GraphBuilder("body")
    xt = bb.parameter("x_t", (B, 3, I))
    bb.result(xt, "y")
    body = bb.build()
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (B, 6, I))
    with pytest.raises(NotImplementedError, match="part_size"):
        gb.tensor_iterator(
            [x], body,
            input_map=[("x_t", {"axis": 1, "part_size": 3, "stride": 1})],
            output_map=[("y", {"axis": 1, "part_size": 3, "stride": 3})])


def test_loop_dynamic_trip_count_with_concat_refused():
    bb = GraphBuilder("lbody")
    x = bb.parameter("x_in", (1, 3))
    bb.result(bb.reshape(x, (1, 1, 3)), "y_step")
    bb.result(bb.const(np.asarray(True).reshape(())), "cond")
    body = bb.build()
    gb = GraphBuilder("outer")
    tc = gb.parameter("tc", (), dtype=np.int64)  # traced, not constant
    ec = gb.const(np.asarray(True).reshape(()))
    x0 = gb.parameter("x", (1, 3))
    with pytest.raises(ValueError, match="static iteration count"):
        gb.loop(tc, ec, [x0], body, input_map=["x_in"],
                output_map=[("y_step", {"axis": 1})],
                condition_result="cond")


def test_if_mismatched_branch_shapes_refused():
    tb = GraphBuilder("then")
    xp = tb.parameter("xa", (B, H))
    tb.result(xp, "r")
    eb = GraphBuilder("else")
    xq = eb.parameter("xb", (B, H))
    eb.result(eb.reshape(xq, (B * H,)), "r")
    gb = GraphBuilder("ifnet")
    cond = gb.parameter("c", (), dtype=np.bool_)
    xv = gb.parameter("x", (B, H))
    with pytest.raises(ValueError, match="disagree"):
        gb.if_op(cond, [xv], tb.build(), eb.build(),
                 ["xa"], ["xb"], ["r"], ["r"])


# -- round-5 review-finding regressions ---------------------------------------


def test_strided_sampling_port_map_refused():
    """part_size=1 with |stride|>1 is a strided-sampling walk the chunked
    slicing cannot realize — must refuse, not silently mis-slice."""
    bb = GraphBuilder("body")
    xt = bb.parameter("x_t", (B, 1, I))
    bb.result(xt, "y")
    body = bb.build()
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (B, 6, I))
    with pytest.raises(NotImplementedError, match="stride"):
        gb.tensor_iterator(
            [x], body,
            input_map=[("x_t", {"axis": 1, "stride": 2})],
            output_map=[("y", {"axis": 1, "stride": 2})])


def test_ti_output_purpose_refused():
    """purpose-tagged OUTPUT entries are Loop-only — a TI carrying one
    must fail fast instead of emitting a phantom port."""
    from pyopenvino_tpu.ir.subgraph import PortMapEntry, SubGraph
    from pyopenvino_tpu.ops.subgraph import TensorIterator

    bb = GraphBuilder("body")
    xt = bb.parameter("x_t", (B, 1, I))
    bb.result(xt, "y")
    body = bb.build()
    rid = body.results[0].id
    pid = body.parameters[0].id
    sg = SubGraph(
        model=body,
        inputs=[PortMapEntry(0, pid, axis=1)],
        outputs=[PortMapEntry(1, rid, axis=1),
                 PortMapEntry(-1, rid, purpose="execution_condition")])
    from pyopenvino_tpu.ir.model import Node, TensorInfo

    node = Node(id=0, name="ti", op_type="TensorIterator", attrs={},
                inputs={0: TensorInfo((B, 5, I), np.dtype(np.float32))},
                outputs={}, subgraphs={"body": sg})
    with pytest.raises(ValueError, match="Loop-only"):
        TensorIterator().infer_shapes(node, {0: (B, 5, I)}, {})


def test_if_branch_dtype_mismatch_refused():
    tb = GraphBuilder("then")
    xp = tb.parameter("xa", (B, H))
    tb.result(tb.relu(xp), "r")
    eb = GraphBuilder("else")
    xq = eb.parameter("xb", (B, H))
    eb.result(eb.convert(eb.relu(xq), "i32"), "r")
    gb = GraphBuilder("ifnet")
    cond = gb.parameter("c", (), dtype=np.bool_)
    xv = gb.parameter("x", (B, H))
    with pytest.raises(ValueError, match="dtypes disagree"):
        gb.if_op(cond, [xv], tb.build(), eb.build(),
                 ["xa"], ["xb"], ["r"], ["r"])


def test_ti_last_value_not_stacked():
    """Last-value outputs ride the scan carry: the traced program's scan
    must stack exactly ONE ys output (the concat Y) — H_last comes from
    the final carry, not a (T, ...) buffer read at [-1]."""
    import jax

    W, R, bias = _weights()
    m = _ti_model(W, R, bias)
    from pyopenvino_tpu.runtime.compiler import compile_model as cm

    net = cm(m, Config(backend=Backend.XLA))
    feed = _feed()
    jaxpr = jax.make_jaxpr(net._fn)(
        net.weights, {k: np.asarray(v) for k, v in feed.items()})
    scans = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "scan"]
    assert len(scans) == 1, [e.primitive.name for e in jaxpr.jaxpr.eqns]
    eqn = scans[0]
    n_ys = len(eqn.outvars) - eqn.params["num_carry"]
    assert n_ys == 1, (n_ys, eqn.params)   # only the concat output stacks
    ref = Interpreter(m).run(feed)
    got = net(feed)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4)


def test_nested_if_inside_tensor_iterator():
    """Control-flow nesting: an If whose condition depends on the carried
    state, inside a TI body — both executors recurse (the nested body's
    weights join the pytree under chained sub.* prefixes)."""
    T, F = 4, 3
    tb = GraphBuilder("then")
    xa = tb.parameter("xa", (B, F))
    tb.result(tb.multiply(xa, tb.const(np.float32(2).reshape(()))), "r")
    eb = GraphBuilder("else")
    xb_ = eb.parameter("xb", (B, F))
    eb.result(eb.add(xb_, eb.const(np.float32(10).reshape(()))), "r")
    bb = GraphBuilder("tibody")
    xt = bb.parameter("x_t", (B, 1, F))
    s = bb.parameter("s_in", (B, F))
    xf = bb.reshape(xt, (B, F))
    ssum = bb.reduce("Sum", s, axes=(0, 1), keep_dims=False)
    cond = bb.compare("Greater", ssum,
                      bb.const(np.float32(0).reshape(())))
    y = bb.if_op(cond, [xf], tb.build(), eb.build(),
                 ["xa"], ["xb"], ["r"], ["r"])
    bb.result(bb.add(s, xf), "s_out")
    bb.result(bb.reshape(y, (B, 1, F)), "y_out")
    gb = GraphBuilder("outer")
    x = gb.parameter("x", (B, T, F))
    s0 = gb.parameter("s0", (B, F))
    outs = gb.tensor_iterator(
        [x, s0], bb.build(),
        input_map=[("x_t", {"axis": 1}), "s_in"],
        output_map=[("y_out", {"axis": 1}), "s_out"],
        back_edges=[("s_out", "s_in")])
    gb.result(outs[0], "Y")
    gb.result(outs[1], "S")
    m = gb.build()
    feed = {"x": RNG.standard_normal((B, T, F)).astype(np.float32),
            "s0": RNG.standard_normal((B, F)).astype(np.float32)}
    ref = Interpreter(m).run(feed)
    got = compile_model(m, Config(backend=Backend.XLA))(feed)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


def test_ocr_ti_export_round_trip(tmp_path):
    """The TI family through the compiled-artifact export (.ovtpu
    StableHLO): scans serialize and re-import with parity."""
    from __graft_entry__ import _model_paths
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.export import import_compiled

    xml, binp = _model_paths("ocr-ti")
    net = compile_model(read_ir_model(xml, binp),
                        Config(backend=Backend.XLA))
    blob = RNG.uniform(0, 255, (1, 24, 32)).astype(np.float32)
    want = net.infer({"data": blob})
    art = str(tmp_path / "ocr.ovtpu")
    net.export(art, buckets=(1,))
    imp = import_compiled(art)
    got = imp.infer_batch({"data": blob[None]})
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]).reshape(want[k].shape), want[k],
            rtol=1e-4, atol=1e-4)
