"""Recurrent ops (ops/recurrent.py): numerics vs torch, twins vs each other,
sequence-length masking, directions, and streaming via variable state.

Gate-order translation used to compare against torch (torch orders LSTM
gates i,f,g,o and GRU gates r,z,n; OpenVINO uses fico / zrh):
the torch chunks are permuted into the OpenVINO layout before building the
IR weights, so an exact numerical match IS the gate-order proof.
"""

import numpy as np
import pytest
import torch

from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter

RTOL, ATOL = 1e-4, 1e-5


def _np(t):
    return t.detach().numpy().astype(np.float32)


def _lstm_weights_from_torch(w_ih, w_hh, b_ih, b_hh, H):
    """torch (i,f,g,o) chunks -> OpenVINO fico W:[4H,I], R:[4H,H], B:[4H]."""
    perm = [1, 0, 2, 3]  # i,f,g,o -> f,i,g(c),o

    def reorder(m):
        chunks = np.split(m, 4, axis=0)
        return np.concatenate([chunks[p] for p in perm], axis=0)

    return reorder(w_ih), reorder(w_hh), reorder(b_ih + b_hh)


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    B, I, H = 3, 5, 7
    cell = torch.nn.LSTMCell(I, H)
    x = torch.randn(B, I)
    h0 = torch.randn(B, H)
    c0 = torch.randn(B, H)
    h1, c1 = cell(x, (h0, c0))

    W, R, Bb = _lstm_weights_from_torch(
        _np(cell.weight_ih), _np(cell.weight_hh),
        _np(cell.bias_ih), _np(cell.bias_hh), H,
    )
    b = GraphBuilder("lstm_cell")
    xs = b.parameter("x", (B, I))
    hs = b.parameter("h", (B, H))
    cs = b.parameter("c", (B, H))
    ho, co = b.lstm_cell(xs, hs, cs, b.const(W), b.const(R), b.const(Bb), H)
    b.result(ho, name="h")
    b.result(co, name="c")
    model = b.build()

    feeds = {"x": _np(x), "h": _np(h0), "c": _np(c0)}
    for out in (Interpreter(model).run(feeds), compile_model(model).infer(feeds)):
        np.testing.assert_allclose(out["h"], _np(h1), rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(out["c"], _np(c1), rtol=RTOL, atol=ATOL)


def test_gru_cell_matches_torch_linear_before_reset():
    """torch.nn.GRUCell computes the candidate with the reset applied AFTER
    the hidden linear — OpenVINO's linear_before_reset=1 form."""
    torch.manual_seed(1)
    B, I, H = 2, 4, 6
    cell = torch.nn.GRUCell(I, H)
    x = torch.randn(B, I)
    h0 = torch.randn(B, H)
    h1 = cell(x, h0)

    perm = [1, 0, 2]  # torch r,z,n -> ov z,r,h

    def reorder(m):
        ch = np.split(m, 3, axis=0)
        return np.concatenate([ch[p] for p in perm], axis=0)

    W = reorder(_np(cell.weight_ih))
    R = reorder(_np(cell.weight_hh))
    bi = np.split(_np(cell.bias_ih), 3)
    bh = np.split(_np(cell.bias_hh), 3)
    # OV lbr B = [bz, br, Wbh, Rbh]
    Bb = np.concatenate([bi[1] + bh[1], bi[0] + bh[0], bi[2], bh[2]])

    b = GraphBuilder("gru_cell")
    xs = b.parameter("x", (B, I))
    hs = b.parameter("h", (B, H))
    ho = b.gru_cell(xs, hs, b.const(W), b.const(R), b.const(Bb), H,
                    linear_before_reset=1)
    b.result(ho, name="h")
    model = b.build()

    feeds = {"x": _np(x), "h": _np(h0)}
    for out in (Interpreter(model).run(feeds), compile_model(model).infer(feeds)):
        np.testing.assert_allclose(out["h"], _np(h1), rtol=RTOL, atol=ATOL)


def test_gru_cell_plain_reset_formula():
    """linear_before_reset=0: candidate = tanh(xp_h + (r∘h)·Rhᵀ + bh) —
    checked against a hand-rolled numpy formula, twins agree."""
    rng = np.random.default_rng(2)
    B, I, H = 2, 3, 4
    x = rng.standard_normal((B, I)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    W = rng.standard_normal((3 * H, I)).astype(np.float32) * 0.3
    R = rng.standard_normal((3 * H, H)).astype(np.float32) * 0.3
    Bb = rng.standard_normal(3 * H).astype(np.float32) * 0.1

    def sig(v):
        return 1 / (1 + np.exp(-v))

    xp = x @ W.T
    hp = h @ R[:2 * H].T
    z = sig(xp[:, :H] + hp[:, :H] + Bb[:H])
    r = sig(xp[:, H:2 * H] + hp[:, H:2 * H] + Bb[H:2 * H])
    cand = np.tanh(xp[:, 2 * H:] + (r * h) @ R[2 * H:].T + Bb[2 * H:])
    want = (1 - z) * cand + z * h

    b = GraphBuilder("gru_plain")
    xs = b.parameter("x", (B, I))
    hs = b.parameter("h", (B, H))
    ho = b.gru_cell(xs, hs, b.const(W), b.const(R), b.const(Bb), H)
    b.result(ho, name="h")
    model = b.build()
    feeds = {"x": x, "h": h}
    for out in (Interpreter(model).run(feeds), compile_model(model).infer(feeds)):
        np.testing.assert_allclose(out["h"], want, rtol=RTOL, atol=ATOL)


def test_rnn_cell_matches_torch():
    torch.manual_seed(3)
    B, I, H = 2, 5, 4
    cell = torch.nn.RNNCell(I, H)
    x = torch.randn(B, I)
    h0 = torch.randn(B, H)
    h1 = cell(x, h0)

    b = GraphBuilder("rnn_cell")
    xs = b.parameter("x", (B, I))
    hs = b.parameter("h", (B, H))
    ho = b.rnn_cell(
        xs, hs, b.const(_np(cell.weight_ih)), b.const(_np(cell.weight_hh)),
        b.const(_np(cell.bias_ih) + _np(cell.bias_hh)), H,
    )
    b.result(ho, name="h")
    model = b.build()
    feeds = {"x": _np(x), "h": _np(h0)}
    for out in (Interpreter(model).run(feeds), compile_model(model).infer(feeds)):
        np.testing.assert_allclose(out["h"], _np(h1), rtol=RTOL, atol=ATOL)


def _build_lstm_seq(B, T, I, H, D, W, R, Bb, direction):
    b = GraphBuilder("lstm_seq")
    xs = b.parameter("x", (B, T, I))
    hs = b.parameter("h", (B, D, H))
    cs = b.parameter("c", (B, D, H))
    lens = b.parameter("lens", (B,), dtype=np.int32)
    y, ho, co = b.lstm_sequence(
        xs, hs, cs, lens, b.const(W), b.const(R), b.const(Bb), H,
        direction=direction,
    )
    b.result(y, name="y")
    b.result(ho, name="ho")
    b.result(co, name="co")
    return b.build()


@pytest.mark.parametrize("direction", ["forward", "bidirectional"])
def test_lstm_sequence_matches_torch(direction):
    torch.manual_seed(4)
    B, T, I, H = 2, 5, 3, 4
    D = 2 if direction == "bidirectional" else 1
    m = torch.nn.LSTM(I, H, batch_first=True,
                      bidirectional=(direction == "bidirectional"))
    x = torch.randn(B, T, I)
    h0 = torch.randn(D, B, H)
    c0 = torch.randn(D, B, H)
    y, (hn, cn) = m(x, (h0, c0))

    Ws, Rs, Bs = [], [], []
    for di in range(D):
        sfx = "_reverse" if di == 1 else ""
        W, R, Bb = _lstm_weights_from_torch(
            _np(getattr(m, f"weight_ih_l0{sfx}")),
            _np(getattr(m, f"weight_hh_l0{sfx}")),
            _np(getattr(m, f"bias_ih_l0{sfx}")),
            _np(getattr(m, f"bias_hh_l0{sfx}")), H,
        )
        Ws.append(W)
        Rs.append(R)
        Bs.append(Bb)
    model = _build_lstm_seq(
        B, T, I, H, D, np.stack(Ws), np.stack(Rs), np.stack(Bs), direction
    )
    feeds = {
        "x": _np(x),
        "h": _np(h0).transpose(1, 0, 2),
        "c": _np(c0).transpose(1, 0, 2),
        "lens": np.full(B, T, np.int32),
    }
    # torch y is (B, T, D*H) with per-direction columns; ours (B, D, T, H)
    want_y = _np(y).reshape(B, T, D, H).transpose(0, 2, 1, 3)
    for out in (Interpreter(model).run(feeds),
                compile_model(model).infer(feeds)):
        np.testing.assert_allclose(out["y"], want_y, rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(
            out["ho"], _np(hn).transpose(1, 0, 2), rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(
            out["co"], _np(cn).transpose(1, 0, 2), rtol=RTOL, atol=ATOL)


def test_lstm_sequence_masking_and_reverse():
    """Rows shorter than T: Y zero past the length, final state = last
    valid step; reverse direction = forward over the reversed valid
    prefix.  Checked by slicing a shorter run out of the same weights."""
    rng = np.random.default_rng(5)
    B, T, I, H = 2, 6, 3, 4
    W = (rng.standard_normal((1, 4 * H, I)) * 0.4).astype(np.float32)
    R = (rng.standard_normal((1, 4 * H, H)) * 0.4).astype(np.float32)
    Bb = (rng.standard_normal((1, 4 * H)) * 0.1).astype(np.float32)
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    h0 = np.zeros((B, 1, H), np.float32)
    c0 = np.zeros((B, 1, H), np.float32)
    lens = np.array([4, 6], np.int32)

    for direction in ("forward", "reverse"):
        model = _build_lstm_seq(B, T, I, H, 1, W, R, Bb, direction)
        net = compile_model(model)
        out = net.infer({"x": x, "h": h0, "c": c0, "lens": lens})
        it_out = Interpreter(model).run(
            {"x": x, "h": h0, "c": c0, "lens": lens})
        np.testing.assert_allclose(out["y"], it_out["y"],
                                   rtol=RTOL, atol=ATOL)
        # masked tail is exactly zero
        np.testing.assert_array_equal(out["y"][0, 0, 4:], 0.0)
        # row 0 equals a standalone T=4 run
        model4 = _build_lstm_seq(1, 4, I, H, 1, W, R, Bb, direction)
        out4 = compile_model(model4).infer({
            "x": x[:1, :4], "h": h0[:1], "c": c0[:1],
            "lens": np.array([4], np.int32),
        })
        np.testing.assert_allclose(out["y"][0, 0, :4], out4["y"][0, 0],
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(out["ho"][0], out4["ho"][0],
                                   rtol=RTOL, atol=ATOL)


def test_gru_sequence_matches_torch():
    torch.manual_seed(6)
    B, T, I, H = 2, 4, 3, 5
    m = torch.nn.GRU(I, H, batch_first=True)
    x = torch.randn(B, T, I)
    h0 = torch.randn(1, B, H)
    y, hn = m(x, h0)

    perm = [1, 0, 2]

    def reorder(mat):
        ch = np.split(mat, 3, axis=0)
        return np.concatenate([ch[p] for p in perm], axis=0)

    W = reorder(_np(m.weight_ih_l0))[None]
    R = reorder(_np(m.weight_hh_l0))[None]
    bi = np.split(_np(m.bias_ih_l0), 3)
    bh = np.split(_np(m.bias_hh_l0), 3)
    Bb = np.concatenate([bi[1] + bh[1], bi[0] + bh[0], bi[2], bh[2]])[None]

    b = GraphBuilder("gru_seq")
    xs = b.parameter("x", (B, T, I))
    hs = b.parameter("h", (B, 1, H))
    lens = b.parameter("lens", (B,), dtype=np.int32)
    yv, ho = b.gru_sequence(
        xs, hs, lens, b.const(W.astype(np.float32)),
        b.const(R.astype(np.float32)), b.const(Bb.astype(np.float32)), H,
        linear_before_reset=1,
    )
    b.result(yv, name="y")
    b.result(ho, name="ho")
    model = b.build()
    feeds = {"x": _np(x), "h": _np(h0).transpose(1, 0, 2),
             "lens": np.full(B, T, np.int32)}
    for out in (Interpreter(model).run(feeds),
                compile_model(model).infer(feeds)):
        np.testing.assert_allclose(out["y"][:, 0], _np(y),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(out["ho"][:, 0], _np(hn)[0],
                                   rtol=RTOL, atol=ATOL)


def test_streaming_lstm_cell_with_variable_state():
    """LSTMCell + ReadValue/Assign = streaming inference: feeding a
    sequence one step at a time equals LSTMSequence over the whole
    sequence — the low-latency stateful pattern (ops/state_ops.py)."""
    rng = np.random.default_rng(7)
    B, T, I, H = 1, 5, 3, 4
    W = (rng.standard_normal((4 * H, I)) * 0.4).astype(np.float32)
    R = (rng.standard_normal((4 * H, H)) * 0.4).astype(np.float32)
    Bb = (rng.standard_normal(4 * H) * 0.1).astype(np.float32)
    x = rng.standard_normal((B, T, I)).astype(np.float32)

    b = GraphBuilder("stream")
    xs = b.parameter("x", (B, I))
    h = b.read_value(b.const(np.zeros((B, H), np.float32)), "h")
    c = b.read_value(b.const(np.zeros((B, H), np.float32)), "c")
    ho, co = b.lstm_cell(xs, h, c, b.const(W), b.const(R), b.const(Bb), H)
    b.assign(ho, "h")
    b.assign(co, "c")
    b.result(ho, name="out")
    stream = compile_model(b.build())

    seq = _build_lstm_seq(B, T, I, H, 1, W[None], R[None], Bb[None],
                          "forward")
    want = compile_model(seq).infer({
        "x": x, "h": np.zeros((B, 1, H), np.float32),
        "c": np.zeros((B, 1, H), np.float32),
        "lens": np.full(B, T, np.int32),
    })["y"][0, 0]

    got = np.stack([stream.infer({"x": x[:, t]})["out"][0]
                    for t in range(T)])
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_recurrent_weights_quantize_int8w():
    """INT8 weight-only now covers the recurrent family: the LSTM W/R
    stacks quantize per output row (passes/quantize.py _RECURRENT) and
    dequantize through ctx.weight_for at trace time — previously int8w
    on an RNN model silently quantized nothing."""
    import numpy as np

    from __graft_entry__ import _model_paths
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.passes.quantize import quantize_weights
    from pyopenvino_tpu.runtime.compiler import compile_model

    m = read_ir_model(*_model_paths("lstm-tiny"))
    q = quantize_weights(m)
    rec_ranks = sorted(m.nodes[nid].const.ndim for nid in q)
    assert len(q) >= 5 and 3 in rec_ranks  # the (D, 4H, I) stacks went int8
    for nid, (qw, scale) in q.items():
        assert qw.dtype == np.int8
        if m.nodes[nid].const.ndim == 3:  # (D, gates*H, I) stacks
            # per-(direction, output-row) scale: contraction axis reduced
            assert scale.shape[:2] == qw.shape[:2] and scale.shape[2] == 1
    blob = np.random.default_rng(0).uniform(0, 255, (1, 32, 40)).astype(
        np.float32)
    ref = compile_model(m, Config())({"data": blob})
    got = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))(
        {"data": blob})
    k = next(iter(ref))
    assert np.argmax(got[k]) == np.argmax(ref[k])
    assert float(np.abs(got[k] - ref[k]).max()) < 0.01
