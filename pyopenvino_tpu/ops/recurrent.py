"""Recurrent ops: RNNCell / GRUCell / LSTMCell / LSTMSequence / GRUSequence.

The reference has no recurrent support at all (pyopenvino/op_plugins/ has no
RNN plugin; a speech/sequence IR dies at inference_engine.py:270-272).  These
follow the OpenVINO opset semantics:

  * LSTMCell (opset4):  gate order **fico** (forget, input, candidate,
    output) — W:[4H, I], R:[4H, H], B:[4H]; outputs Ho, Co.
  * GRUCell (opset3):   gate order **zrh**; ``linear_before_reset`` switches
    the candidate to  g(Xt·Whᵀ + rt∘(Ht·Rhᵀ + Rbh) + Wbh)  with B:[4H]
    (= bz, br, Wbh, Rbh); plain form uses  g(Xt·Whᵀ + (rt∘Ht)·Rhᵀ + bh),
    B:[3H].
  * RNNCell (opset3):   Ht = g(Xt·Wᵀ + Ht·Rᵀ + B).
  * LSTMSequence (opset5) / GRUSequence (opset5): batch-first layout —
    X:[B, T, I], states:[B, D, H], sequence_lengths:[B], W:[D, GH, I],
    R:[D, GH, H], B:[D, GH]; direction forward / reverse / bidirectional;
    Y:[B, D, T, H] plus final state(s) [B, D, H].  Past a row's sequence
    length, Y is zero and the carried state holds its last valid value
    (ONNX/OpenVINO masking).

TPU-native design: a sequence op is ONE ``lax.scan`` whose carried state is
(H[, C]).  The input projection X·Wᵀ for ALL timesteps is hoisted out of the
scan into a single (B·T, I)×(I, GH) MXU GEMM (XLA cannot do this itself — a
matmul indexed by the loop counter stays inside the while-loop body); the
per-step body is then one (B, H)×(H, GH) GEMM plus VPU gate math, which XLA
fuses.  ``clip`` (when set) bounds the pre-activation gate inputs, per the
opset.  Both twins (numpy ref_compute / JAX emit) run the same step
functions — everything in them dispatches on array type.

For *streaming* single-step topologies, pair the cells with
ReadValue/Assign variable state (ops/state_ops.py) — tools/gen_lstm.py
builds exactly that model family.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _act(name: str):
    """Activation by opset name, usable on numpy arrays and JAX tracers."""
    def fn(x):
        if isinstance(x, np.ndarray):
            if name == "sigmoid":
                return 1.0 / (1.0 + np.exp(-x))
            if name == "tanh":
                return np.tanh(x)
            if name == "relu":
                return np.maximum(x, 0.0)
            raise ValueError(f"unsupported recurrent activation {name!r}")
        import jax

        if name == "sigmoid":
            return jax.nn.sigmoid(x)
        if name == "tanh":
            return jax.numpy.tanh(x)
        if name == "relu":
            return jax.nn.relu(x)
        raise ValueError(f"unsupported recurrent activation {name!r}")

    return fn


def _activations(node, defaults):
    names = [
        s.strip() for s in node.attrs.get("activations", "").split(",")
        if s.strip()
    ]
    if not names:
        names = list(defaults)
    if len(names) != len(defaults):
        raise ValueError(
            f"{node.op_type}: expected {len(defaults)} activations, "
            f"got {names}"
        )
    return [_act(n) for n in names]


def _clipper(node):
    clip = float(node.attrs.get("clip", 0) or 0)
    if clip <= 0:
        return lambda x: x

    def fn(x):
        if isinstance(x, np.ndarray):
            return np.clip(x, -clip, clip)
        import jax.numpy as jnp

        return jnp.clip(x, -clip, clip)

    return fn


def _hidden(node) -> int:
    return A.get_int(node.attrs, "hidden_size")


def _mm(a, b_t):
    """a @ b_t.T for numpy arrays or JAX tracers (weights stored
    gate-major [GH, I] per the opset — transpose puts GH in lanes)."""
    return a @ b_t.swapaxes(-1, -2)


def _xp(x):
    """Array namespace (numpy / jax.numpy) matching x."""
    if isinstance(x, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


# -- step functions -----------------------------------------------------------
# Each takes the PRE-PROJECTED input xp = x·Wᵀ so the sequence ops can hoist
# the projection of all timesteps into one GEMM; the cells project inline.


def _lstm_step(xp, h, c, r, b, acts, clip):
    """One fico LSTM step on projected input; returns (h', c')."""
    f_, g_, h_ = acts
    gates = clip(xp + _mm(h, r) + b)
    H = h.shape[-1]
    f = f_(gates[..., 0 * H:1 * H])
    i = f_(gates[..., 1 * H:2 * H])
    cand = g_(gates[..., 2 * H:3 * H])
    o = f_(gates[..., 3 * H:4 * H])
    c_new = f * c + i * cand
    return o * h_(c_new), c_new


def _gru_step(xp, h, r, b, acts, clip, linear_before_reset):
    """One zrh GRU step on projected input; returns h'."""
    f_, g_ = acts
    H = h.shape[-1]
    if linear_before_reset:
        # B = [bz, br, Wbh, Rbh] (4H); candidate resets AFTER the
        # hidden-side linear: g(xp_h + r∘(h·Rhᵀ + Rbh) + Wbh)
        hp = _mm(h, r)
        z = f_(clip(xp[..., :H] + hp[..., :H] + b[..., :H]))
        rt = f_(clip(xp[..., H:2 * H] + hp[..., H:2 * H] + b[..., H:2 * H]))
        cand = g_(clip(
            xp[..., 2 * H:3 * H]
            + rt * (hp[..., 2 * H:3 * H] + b[..., 3 * H:4 * H])
            + b[..., 2 * H:3 * H]
        ))
    else:
        hp = _mm(h, r[:2 * H, :])
        z = f_(clip(xp[..., :H] + hp[..., :H] + b[..., :H]))
        rt = f_(clip(xp[..., H:2 * H] + hp[..., H:2 * H] + b[..., H:2 * H]))
        cand = g_(clip(
            xp[..., 2 * H:3 * H]
            + _mm(rt * h, r[2 * H:3 * H, :])
            + b[..., 2 * H:3 * H]
        ))
    return (1.0 - z) * cand + z * h


# -- single-step cells --------------------------------------------------------


class _CellBase(Op):
    """Shared cell plumbing: weights resolve via ctx.weight_for, both twins
    share _compute."""

    first_weight_port = 0

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = self._compute(node, inputs)
        return {k: np.asarray(v, dtype=inputs[1].dtype)
                for k, v in out.items()}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        ins = {
            p: ctx.weight_for(node, tv) if p >= self.first_weight_port
            else tv.nchw()
            for p, tv in inputs.items()
        }
        return {p: TValue(v, "L")
                for p, v in self._compute(node, ins).items()}


@register
class LSTMCell(_CellBase):
    type_name = "LSTMCell"
    first_weight_port = 3  # X, H, C | W, R, B

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        ports = _out_ports(node, 2)
        return ShapeResult({ports[0]: tuple(in_shapes[1]),
                            ports[1]: tuple(in_shapes[1])})

    def _compute(self, node, ins):
        acts = _activations(node, ("sigmoid", "tanh", "tanh"))
        h, c = _lstm_step(
            _mm(ins[0], ins[3]), ins[1], ins[2], ins[4], ins[5],
            acts, _clipper(node),
        )
        p = _out_ports(node, 2)
        return {p[0]: h, p[1]: c}


@register
class GRUCell(_CellBase):
    type_name = "GRUCell"
    first_weight_port = 2  # X, H | W, R, B

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: tuple(in_shapes[1])})

    def _compute(self, node, ins):
        acts = _activations(node, ("sigmoid", "tanh"))
        lbr = A.get_bool(node.attrs, "linear_before_reset", False)
        h = _gru_step(
            _mm(ins[0], ins[2]), ins[1], ins[3], ins[4],
            acts, _clipper(node), lbr,
        )
        return {node.out_port: h}


@register
class RNNCell(_CellBase):
    type_name = "RNNCell"
    first_weight_port = 2  # X, H | W, R, B

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: tuple(in_shapes[1])})

    def _compute(self, node, ins):
        (g,) = _activations(node, ("tanh",))
        clip = _clipper(node)
        h = g(clip(_mm(ins[0], ins[2]) + _mm(ins[1], ins[3]) + ins[4]))
        return {node.out_port: h}


# -- sequences ----------------------------------------------------------------


def _out_ports(node, n):
    """Declared output port ids (parsed IR), else consecutive from the
    first placeholder (builder eager inference) — same convention as
    Split (ops/extended.py)."""
    ports = sorted(node.outputs)
    if len(ports) == n:
        return ports
    return [node.out_port + i for i in range(n)]


def _directions(node) -> int:
    d = node.attrs.get("direction", "forward")
    if d not in ("forward", "reverse", "bidirectional"):
        raise ValueError(f"{node.op_type}: bad direction {d!r}")
    return 2 if d == "bidirectional" else 1


def _reverse_valid(x, lens):
    """Reverse each row's valid prefix along the time axis (axis 1):
    out[i, t] = x[i, len_i-1-t] for t < len_i, x[i, t] past it."""
    xp = _xp(x)
    T = x.shape[1]
    t = xp.arange(T)[None, :]
    ln = xp.asarray(lens).reshape(-1, 1).astype(t.dtype)
    idx = xp.where(t < ln, ln - 1 - t, t)
    return xp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def _scan_one_direction(step_fn, xproj, state, lens):
    """Run ``step_fn(xp_t, state) -> (state', y_t)`` over the projected
    input xproj [B, T, GH] with sequence-length masking; returns
    (final_state, Y [B, T, H]).

    numpy path: plain loop (interpreter twin).  JAX path: one lax.scan —
    masking lives inside the body so the whole sequence is a single
    fused loop on device."""
    T = xproj.shape[1]
    if isinstance(xproj, np.ndarray):
        ys = []
        for t in range(T):
            new_state, y = step_fn(xproj[:, t], state)
            valid = (t < lens).reshape(-1, 1)
            state = tuple(
                np.where(valid, n, o) for n, o in zip(new_state, state)
            )
            ys.append(np.where(valid, y, 0.0))
        return state, np.stack(ys, axis=1)

    import jax
    import jax.numpy as jnp

    lens_a = jnp.asarray(lens).reshape(-1, 1)

    def body(carry, xt_t):
        xt, t = xt_t
        new_state, y = step_fn(xt, carry)
        valid = t < lens_a
        st = tuple(
            jnp.where(valid, n, o) for n, o in zip(new_state, carry)
        )
        return st, jnp.where(valid, y, 0.0)

    xs = (jnp.moveaxis(xproj, 1, 0), jnp.arange(T))
    state, Y = jax.lax.scan(body, tuple(state), xs)
    return state, jnp.moveaxis(Y, 0, 1)


class _SequenceBase(Op):
    """Shared LSTM/GRU sequence machinery.  Input ports:
    0:X, 1..n_state:init states, then sequence_lengths, W, R, B."""

    n_state = 0  # carried tensors (H[, C])

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        b, t, _ = in_shapes[0]
        h = _hidden(node)
        d = _directions(node)
        ports = _out_ports(node, 1 + self.n_state)
        out = {ports[0]: (b, d, t, h)}
        for k in range(self.n_state):
            out[ports[1 + k]] = (b, d, h)
        return ShapeResult(out)

    def _dir_step(self, node, r, b):
        """step(xp_t, state) -> (state', y_t) for one direction's R/B."""
        raise NotImplementedError

    def _run(self, node, ins):
        d = _directions(node)
        reverse0 = node.attrs.get("direction", "forward") == "reverse"
        x = ins[0]
        lens = ins[1 + self.n_state]
        w_all = ins[2 + self.n_state]
        r_all = ins[3 + self.n_state]
        b_all = ins[4 + self.n_state]
        xp = _xp(x)
        ys, finals = [], []
        for di in range(d):
            state = tuple(ins[1 + k][:, di] for k in range(self.n_state))
            rev = (di == 1) or reverse0
            xd = _reverse_valid(x, lens) if rev else x
            # the hoisted projection: all T steps in one MXU GEMM
            xproj = _mm(xd, w_all[di])
            state, Y = _scan_one_direction(
                self._dir_step(node, r_all[di], b_all[di]),
                xproj, state, lens,
            )
            if rev:
                Y = _reverse_valid(Y, lens)
            ys.append(Y)
            finals.append(state)
        ports = _out_ports(node, 1 + self.n_state)
        out = {ports[0]: xp.stack(ys, axis=1)}  # (B, D, T, H)
        for k in range(self.n_state):
            out[ports[1 + k]] = xp.stack([f[k] for f in finals], axis=1)
        return out

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = self._run(node, inputs)
        return {k: np.asarray(v, dtype=inputs[1].dtype)
                for k, v in out.items()}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        first_w = 2 + self.n_state
        ins = {p: ctx.weight_for(node, tv) if p >= first_w else tv.nchw()
               for p, tv in inputs.items()}
        return {p: TValue(v, "L")
                for p, v in self._run(node, ins).items()}


@register
class LSTMSequence(_SequenceBase):
    type_name = "LSTMSequence"
    n_state = 2

    def _dir_step(self, node, r, b):
        acts = _activations(node, ("sigmoid", "tanh", "tanh"))
        clip = _clipper(node)

        def step(xp_t, state):
            h, c = state
            h2, c2 = _lstm_step(xp_t, h, c, r, b, acts, clip)
            return (h2, c2), h2

        return step


@register
class GRUSequence(_SequenceBase):
    type_name = "GRUSequence"
    n_state = 1

    def _dir_step(self, node, r, b):
        acts = _activations(node, ("sigmoid", "tanh"))
        clip = _clipper(node)
        lbr = A.get_bool(node.attrs, "linear_before_reset", False)

        def step(xp_t, state):
            (h,) = state
            h2 = _gru_step(xp_t, h, r, b, acts, clip, lbr)
            return (h2,), h2

        return step
