"""Extension ops beyond the reference's 21 (opset1 semantics).

The reference implements exactly the op set its four shipped XMLs need
(SURVEY.md §2.2).  Real Model-Optimizer-converted IRs routinely carry a
few more — unfolded mean/scale preprocessing chains (Subtract / Divide /
Power / Sqrt), Squeeze (the mirror of Unsqueeze), Gather for embedding /
axis selection, and explicit Pad — so these are implemented with the
same three entry points (ref_compute / emit / infer_shapes) to keep the
engine from being overfit to the shipped files.  Ops here follow
OpenVINO opset1 semantics; none appear in the reference
(pyopenvino/op_plugins/ has no plugin for any of them — loading such an
IR there dies at run time, inference_engine.py:270-272)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ops.elementwise import _Binary, _Unary
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _norm_axis(value, rank, op):
    """Negative-axis normalization with fail-fast range validation —
    `% rank` alone would silently wrap an out-of-range positive axis
    onto the batch dim (wrong outputs the differential twins cannot
    catch, since both would agree)."""
    axis = int(np.asarray(value).reshape(()))
    if not -rank <= axis < rank:
        raise ValueError(f"{op}: axis {axis} out of range for rank {rank}")
    return axis % rank


@register
class Subtract(_Binary):
    type_name = "Subtract"
    np_fn = staticmethod(lambda a, b: a - b)


@register
class Divide(_Binary):
    type_name = "Divide"
    np_fn = staticmethod(lambda a, b: a / b)


def _dual(np_ufunc, jnp_name):
    """Binary fn usable from both ref_compute (numpy in/out) and emit
    (JAX tracers — numpy ufuncs do not dispatch on tracers)."""
    def fn(a, b):
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
            return np_ufunc(a, b)
        import jax.numpy as jnp

        return getattr(jnp, jnp_name)(a, b)
    return staticmethod(fn)


@register
class Maximum(_Binary):
    type_name = "Maximum"
    np_fn = _dual(np.maximum, "maximum")


@register
class Minimum(_Binary):
    type_name = "Minimum"
    np_fn = _dual(np.minimum, "minimum")


@register
class Power(_Binary):
    """Binary power (opset1): element-wise x ** exponent."""

    type_name = "Power"
    np_fn = staticmethod(lambda a, b: a ** b)


@register
class Sqrt(_Unary):
    type_name = "Sqrt"

    def _apply_np(self, node, x):
        return np.sqrt(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.sqrt(x)


@register
class Exp(_Unary):
    type_name = "Exp"

    def _apply_np(self, node, x):
        return np.exp(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.exp(x)


@register
class Tanh(_Unary):
    type_name = "Tanh"

    def _apply_np(self, node, x):
        return np.tanh(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.tanh(x)


@register
class Squeeze(Op):
    """Drop unit dims — the mirror of Unsqueeze (shape_ops.py).  With no
    axes input every unit dim is dropped (opset1)."""

    type_name = "Squeeze"

    def _out_shape(self, in_shape, axes):
        if axes is None:
            return tuple(d for d in in_shape if d != 1)
        rank = len(in_shape)
        axes = {a % rank for a in axes}
        for a in axes:
            if in_shape[a] != 1:
                raise ValueError(
                    f"Squeeze: axis {a} has extent {in_shape[a]} != 1"
                )
        return tuple(d for i, d in enumerate(in_shape) if i not in axes)

    def _axes(self, node, values):
        axes = values.get(1)
        if 1 in node.inputs and axes is None:
            raise ValueError(f"Squeeze {node.name}: axes are not constant")
        return None if axes is None else tuple(int(a) for a in axes)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        out = self._out_shape(in_shapes[0], self._axes(node, in_values))
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None:
            res.values[node.out_port] = in_values[0].reshape(out)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axes = (tuple(int(a) for a in inputs[1])
                if 1 in inputs else None)
        out = self._out_shape(inputs[0].shape, axes)
        return {node.out_port: inputs[0].reshape(out)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        axes = (tuple(int(a) for a in ctx.static_value(node, 1))
                if 1 in node.inputs else None)
        x = inputs[0].nchw()
        return {node.out_port: TValue(
            x.reshape(self._out_shape(x.shape, axes)), "L")}


@register
class Gather(Op):
    """opset1 Gather: select indices along a constant axis (input 2)."""

    type_name = "Gather"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axis_v = in_values.get(2)
        if axis_v is None:
            raise ValueError(f"Gather {node.name}: axis is not constant")
        data, idx = in_shapes[0], in_shapes[1]
        axis = _norm_axis(axis_v, len(data), "Gather")
        out = tuple(data[:axis]) + tuple(idx) + tuple(data[axis + 1:])
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None and in_values.get(1) is not None:
            res.values[node.out_port] = np.take(
                in_values[0], in_values[1].astype(np.int64), axis=axis)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axis = _norm_axis(inputs[2], inputs[0].ndim, "Gather")
        return {node.out_port: np.take(
            inputs[0], inputs[1].astype(np.int64), axis=axis)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axis = _norm_axis(ctx.static_value(node, 2), x.ndim, "Gather")
        idx = inputs[1].nchw().astype(jnp.int32)
        return {node.out_port: TValue(jnp.take(x, idx, axis=axis), "L")}


@register
class Pad(Op):
    """opset1 Pad: constant/edge/reflect/symmetric padding; pads_begin /
    pads_end are constant inputs (1, 2), constant fill value input 3."""

    type_name = "Pad"

    @staticmethod
    def _mode(node) -> str:
        mode = node.attrs.get("pad_mode", "constant")
        if mode not in ("constant", "edge", "reflect", "symmetric"):
            raise ValueError(f"Pad: unsupported pad_mode {mode!r}")
        return mode

    @staticmethod
    def _pads(source, what):
        arr = source
        if arr is None:
            raise ValueError(f"Pad: {what} is not constant")
        return tuple(int(v) for v in np.asarray(arr).reshape(-1))

    @staticmethod
    def _check_rank(b, e, rank):
        if len(b) != rank or len(e) != rank:
            raise ValueError(
                f"Pad: pads_begin/pads_end have {len(b)}/{len(e)} entries "
                f"for a rank-{rank} input"
            )

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        b = self._pads(in_values.get(1), "pads_begin")
        e = self._pads(in_values.get(2), "pads_end")
        self._check_rank(b, e, len(in_shapes[0]))
        out = tuple(d + pb + pe for d, pb, pe in zip(in_shapes[0], b, e))
        self._mode(node)  # validate early
        return ShapeResult({node.out_port: out})

    def _np_kwargs(self, node, get):
        mode = self._mode(node)
        kw = {"mode": mode}
        if mode == "constant":
            fill = get(3)
            kw["constant_values"] = (
                0.0 if fill is None else float(np.asarray(fill).reshape(()))
            )
        return kw

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        b = self._pads(inputs.get(1), "pads_begin")
        e = self._pads(inputs.get(2), "pads_end")
        self._check_rank(b, e, inputs[0].ndim)
        kw = self._np_kwargs(node, inputs.get)
        return {node.out_port: np.pad(
            inputs[0], tuple(zip(b, e)), **kw)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        b = self._pads(ctx.static_value(node, 1), "pads_begin")
        e = self._pads(ctx.static_value(node, 2), "pads_end")
        x = inputs[0].nchw()
        self._check_rank(b, e, x.ndim)

        def get(port):
            return (ctx.static_value(node, port)
                    if port in node.inputs else None)

        kw = self._np_kwargs(node, get)
        return {node.out_port: TValue(
            jnp.pad(x, tuple(zip(b, e)), **kw), "L")}


def _interp_axis_plan(in_len: int, out_len: int, mode: str,
                      align_corners: bool):
    """Static per-axis resample plan.

    nearest → (idx,) gather indices; linear → (lo, hi, w) with
    out = (1-w)·x[lo] + w·x[hi].  Both the numpy twin and the JAX emit
    consume the SAME precomputed numpy arrays, so interpreter↔XLA parity
    holds by construction (shapes are static under jit, so the plan is a
    trace-time constant)."""
    i = np.arange(out_len, dtype=np.float64)
    if align_corners and out_len > 1:
        pos = i * (in_len - 1) / (out_len - 1)
    else:
        pos = (i + 0.5) * (in_len / out_len) - 0.5
    if mode == "nearest":
        idx = np.clip(np.floor(pos + 0.5), 0, in_len - 1).astype(np.int64)
        return (idx,)
    lo = np.clip(np.floor(pos), 0, in_len - 1).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    w = np.clip(pos - lo, 0.0, 1.0).astype(np.float32)
    return lo, hi, w


@register
class Interpolate(Op):
    """opset1 Interpolate, nearest/linear over constant target dims
    (input 1).  attrs: axes (e.g. "2,3"), mode, align_corners (spec
    DEFAULT 1 — omitted attr means corner-aligned), pads_begin/pads_end
    (zero-pad the input per axis before resampling), antialias
    (unsupported → fail fast)."""

    type_name = "Interpolate"

    @staticmethod
    def _cfg(node):
        from pyopenvino_tpu.ir import attrs as A

        axes = A.get_int_tuple(node.attrs, "axes", (2, 3))
        mode = node.attrs.get("mode", "nearest")
        if mode not in ("nearest", "linear"):
            raise ValueError(f"Interpolate: unsupported mode {mode!r}")
        # opset1 default is align_corners=1, unlike the modern
        # half-pixel-default opsets — an omitted attr must match OpenVINO.
        align = str(node.attrs.get("align_corners", "1")).lower() in (
            "1", "true")
        if str(node.attrs.get("antialias", "0")).lower() in ("1", "true"):
            raise ValueError("Interpolate: antialias is not supported")
        pads_b = A.get_int_tuple(node.attrs, "pads_begin", (0,))
        pads_e = A.get_int_tuple(node.attrs, "pads_end", (0,))
        return axes, mode, align, pads_b, pads_e

    @staticmethod
    def _axis_pads(pads, rank):
        """Spec pads are per-tensor-axis (broadcast a single value)."""
        pads = tuple(int(p) for p in pads)
        if len(pads) == 1:
            pads = pads * rank
        if len(pads) != rank:
            raise ValueError(
                f"Interpolate: {len(pads)} pad entries for rank {rank}")
        return pads

    def _padded_shape(self, node, in_shape):
        _, _, _, pads_b, pads_e = self._cfg(node)
        b = self._axis_pads(pads_b, len(in_shape))
        e = self._axis_pads(pads_e, len(in_shape))
        return tuple(d + pb + pe for d, pb, pe in zip(in_shape, b, e)), b, e

    def _out_shape(self, node, in_shape, target):
        axes = self._cfg(node)[0]
        if target is None:
            raise ValueError(
                f"Interpolate {node.name}: target shape is not constant")
        target = [int(t) for t in np.asarray(target).reshape(-1)]
        if len(target) != len(axes):
            raise ValueError(
                f"Interpolate: {len(axes)} axes but {len(target)} target dims")
        out = list(self._padded_shape(node, in_shape)[0])
        for a, t in zip(axes, target):
            out[_norm_axis(a, len(in_shape), "Interpolate")] = t
        return tuple(out)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: self._out_shape(
            node, in_shapes[0], in_values.get(1))})

    def _resample(self, x, node, target, take, pad, asarray):
        axes, mode, align, _, _ = self._cfg(node)
        rank = x.ndim
        _, b, e = self._padded_shape(node, x.shape)
        if any(b) or any(e):
            x = pad(x, tuple(zip(b, e)))
        target = [int(t) for t in np.asarray(target).reshape(-1)]
        for a, t in zip(axes, target):
            a = _norm_axis(a, rank, "Interpolate")
            plan = _interp_axis_plan(x.shape[a], t, mode, align)
            if mode == "nearest":
                x = take(x, plan[0], a)
            else:
                lo, hi, w = plan
                shape = [1] * rank
                shape[a] = t
                w = asarray(w.reshape(shape))
                x = take(x, lo, a) * (1 - w) + take(x, hi, a) * w
        return x

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = self._resample(
            inputs[0], node, inputs[1],
            take=lambda x, i, a: np.take(x, i, axis=a),
            pad=np.pad,
            asarray=np.asarray,
        )
        return {node.out_port: out.astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        out = self._resample(
            x, node, ctx.static_value(node, 1),
            take=lambda x, i, a: jnp.take(x, jnp.asarray(i), axis=a),
            pad=jnp.pad,
            asarray=jnp.asarray,
        )
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


class _Reduce(Op):
    """opset1 reductions over constant axes (input 1), keep_dims attr.
    MO exports global average pooling as ReduceMean over (2, 3)."""

    np_fn = None      # e.g. np.mean
    jnp_name = ""     # e.g. "mean"

    @staticmethod
    def _keep(node) -> bool:
        return str(node.attrs.get("keep_dims", "true")).lower() in (
            "1", "true")

    @staticmethod
    def _axes(source, rank):
        if source is None:
            raise ValueError("Reduce: axes are not constant")
        return tuple(sorted(
            _norm_axis(a, rank, "Reduce")
            for a in np.asarray(source).reshape(-1)))

    def _out_shape(self, node, in_shape, axes):
        if self._keep(node):
            return tuple(1 if i in axes else d
                         for i, d in enumerate(in_shape))
        return tuple(d for i, d in enumerate(in_shape) if i not in axes)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axes = self._axes(in_values.get(1), len(in_shapes[0]))
        res = ShapeResult({node.out_port: self._out_shape(
            node, in_shapes[0], axes)})
        if in_values.get(0) is not None:
            res.values[node.out_port] = self.np_fn(
                in_values[0], axis=axes, keepdims=self._keep(node))
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axes = self._axes(inputs[1], inputs[0].ndim)
        out = self.np_fn(inputs[0], axis=axes, keepdims=self._keep(node))
        return {node.out_port: np.asarray(out, dtype=inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axes = self._axes(ctx.static_value(node, 1), x.ndim)
        out = getattr(jnp, self.jnp_name)(
            x, axis=axes, keepdims=self._keep(node))
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


@register
class ReduceMean(_Reduce):
    type_name = "ReduceMean"
    np_fn = staticmethod(np.mean)
    jnp_name = "mean"


@register
class ReduceMax(_Reduce):
    type_name = "ReduceMax"
    np_fn = staticmethod(np.max)
    jnp_name = "max"


@register
class ReduceSum(_Reduce):
    type_name = "ReduceSum"
    np_fn = staticmethod(np.sum)
    jnp_name = "sum"


@register
class Split(Op):
    """opset1 Split: cut `data` into num_splits equal parts along a
    constant axis (input 1) — one output port per part.  The first true
    multi-output op in the library (the runtime stores every (node,
    port) pair generically, so nothing else special-cases it)."""

    type_name = "Split"

    @staticmethod
    def _num(node) -> int:
        return int(node.attrs["num_splits"])

    def _ports(self, node, n):
        """Output port ids: the declared ones when the node carries all n
        (parsed IR), else consecutive from the first output port (builder
        placeholder during eager shape inference)."""
        ports = sorted(node.outputs)
        if len(ports) == n:
            return ports
        return [node.out_port + i for i in range(n)]

    @staticmethod
    def _axis(source, rank):
        if source is None:
            raise ValueError("Split: axis is not constant")
        return _norm_axis(source, rank, "Split")

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axis = self._axis(in_values.get(1), len(in_shapes[0]))
        n = self._num(node)
        d = in_shapes[0][axis]
        if d % n:
            raise ValueError(
                f"Split: axis extent {d} not divisible by num_splits {n}")
        piece = list(in_shapes[0])
        piece[axis] = d // n
        ports = self._ports(node, n)
        res = ShapeResult({p: tuple(piece) for p in ports})
        if in_values.get(0) is not None:
            for p, part in zip(ports, np.split(in_values[0], n, axis=axis)):
                res.values[p] = part
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axis = self._axis(inputs.get(1), inputs[0].ndim)
        n = self._num(node)
        return dict(zip(self._ports(node, n),
                        np.split(inputs[0], n, axis=axis)))

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axis = self._axis(ctx.static_value(node, 1), x.ndim)
        n = self._num(node)
        return {p: TValue(part, "L") for p, part in zip(
            self._ports(node, n), jnp.split(x, n, axis=axis))}


@register
class VariadicSplit(Split):
    """opset1 VariadicSplit: cut along a constant axis (input 1) into
    parts of the constant lengths given by input 2 (one entry may be -1,
    absorbing the remainder) — the uneven-splits sibling of Split that
    real OMZ yolo-v2/v3 IRs carry between the head and the decode."""

    type_name = "VariadicSplit"

    @staticmethod
    def _lengths(source, extent: int):
        if source is None:
            raise ValueError("VariadicSplit: split_lengths is not constant")
        lengths = [int(v) for v in np.asarray(source).reshape(-1)]
        wild = [i for i, v in enumerate(lengths) if v == -1]
        if len(wild) > 1:
            raise ValueError(
                "VariadicSplit: at most one split length may be -1")
        fixed = sum(v for v in lengths if v != -1)
        if wild:
            if fixed > extent:
                raise ValueError(
                    f"VariadicSplit: lengths {lengths} exceed axis extent "
                    f"{extent}")
            lengths[wild[0]] = extent - fixed
        elif fixed != extent:
            raise ValueError(
                f"VariadicSplit: lengths {lengths} sum to {fixed}, axis "
                f"extent is {extent}")
        return lengths

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axis = self._axis(in_values.get(1), len(in_shapes[0]))
        lengths = self._lengths(in_values.get(2), in_shapes[0][axis])
        ports = self._ports(node, len(lengths))
        res = ShapeResult({})
        for p, ln in zip(ports, lengths):
            piece = list(in_shapes[0])
            piece[axis] = ln
            res.shapes[p] = tuple(piece)
        if in_values.get(0) is not None:
            cuts = np.cumsum(lengths)[:-1]
            for p, part in zip(
                    ports, np.split(in_values[0], cuts, axis=axis)):
                res.values[p] = part
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axis = self._axis(inputs.get(1), inputs[0].ndim)
        lengths = self._lengths(inputs.get(2), inputs[0].shape[axis])
        cuts = np.cumsum(lengths)[:-1]
        return dict(zip(self._ports(node, len(lengths)),
                        np.split(inputs[0], cuts, axis=axis)))

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axis = self._axis(ctx.static_value(node, 1), x.ndim)
        lengths = self._lengths(
            ctx.static_value(node, 2), x.shape[axis])
        cuts = list(np.cumsum(lengths)[:-1])
        return {p: TValue(part, "L") for p, part in zip(
            self._ports(node, len(lengths)),
            jnp.split(x, cuts, axis=axis))}


class _UnaryAttr(_Unary):
    """Unary activation defined once as a dual numpy/jnp formula."""

    def _formula(self, node, x, m):
        raise NotImplementedError

    def _apply_np(self, node, x):
        return self._formula(node, x, np).astype(x.dtype)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return self._formula(node, x, jnp).astype(x.dtype)


def _sigmoid(x, m):
    return 1.0 / (1.0 + m.exp(-x))


@register
class Elu(_UnaryAttr):
    """opset1 Elu: x>0 → x, else alpha·(e^x − 1)."""

    type_name = "Elu"

    def _formula(self, node, x, m):
        alpha = float(node.attrs.get("alpha", 1.0))
        return m.where(x > 0, x, alpha * (m.exp(m.minimum(x, 0.0)) - 1.0))


@register
class Gelu(_UnaryAttr):
    """Gelu (erf form — opset2/opset7 default approximation_mode=ERF)."""

    type_name = "Gelu"

    def _formula(self, node, x, m):
        mode = node.attrs.get("approximation_mode", "erf").lower()
        if mode == "tanh":
            c = 0.7978845608028654  # sqrt(2/pi)
            return 0.5 * x * (1.0 + m.tanh(c * (x + 0.044715 * x ** 3)))
        if m is np:
            from scipy.special import erf as _erf  # scipy ships in-image
            return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))
        import jax

        return jax.nn.gelu(x, approximate=False)


@register
class SoftPlus(_UnaryAttr):
    """opset4 SoftPlus: ln(1 + e^x), computed stably."""

    type_name = "SoftPlus"

    def _formula(self, node, x, m):
        return m.maximum(x, 0.0) + m.log1p(m.exp(-m.abs(x)))


@register
class Swish(_UnaryAttr):
    """opset4 Swish: x·sigmoid(beta·x) (beta attr, default 1)."""

    type_name = "Swish"

    def _formula(self, node, x, m):
        beta = float(node.attrs.get("beta", 1.0))
        return x * _sigmoid(beta * x, m)


@register
class HSwish(_UnaryAttr):
    """opset4 HSwish: x·min(max(x+3,0),6)/6."""

    type_name = "HSwish"

    def _formula(self, node, x, m):
        return x * m.clip(x + 3.0, 0.0, 6.0) / 6.0


@register
class HSigmoid(_UnaryAttr):
    """opset5 HSigmoid: min(max(x+3,0),6)/6."""

    type_name = "HSigmoid"

    def _formula(self, node, x, m):
        return m.clip(x + 3.0, 0.0, 6.0) / 6.0


@register
class Mish(_UnaryAttr):
    """opset4 Mish: x·tanh(softplus(x))."""

    type_name = "Mish"

    def _formula(self, node, x, m):
        sp = m.maximum(x, 0.0) + m.log1p(m.exp(-m.abs(x)))
        return x * m.tanh(sp)


@register
class PReLU(_Binary):
    """opset1 PReLU: x>0 → x, else slope·x (slope input 1, broadcastable
    per-channel like the reference models' bias constants)."""

    type_name = "PReLU"

    @staticmethod
    def np_fn(x, slope):
        if isinstance(x, np.ndarray) and isinstance(slope, np.ndarray):
            return np.where(x > 0, x, slope * x)
        import jax.numpy as jnp

        return jnp.where(x > 0, x, slope * x)


@register
class MVN(Op):
    """opset1 MVN: per-example mean (and optionally variance)
    normalization.  across_channels selects the reduce span (C,H,W vs
    H,W per channel); eps stabilizes the variance divide."""

    type_name = "MVN"

    @staticmethod
    def _cfg(node):
        across = str(node.attrs.get("across_channels", "0")).lower() in (
            "1", "true")
        normalize = str(node.attrs.get("normalize_variance", "1")).lower() in (
            "1", "true")
        eps = float(node.attrs.get("eps", 1e-9))
        return across, normalize, eps

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: in_shapes[0]})

    def _apply(self, node, x, m):
        across, normalize, eps = self._cfg(node)
        axes = tuple(range(1, x.ndim)) if across else tuple(
            range(2, x.ndim))
        mean = m.mean(x, axis=axes, keepdims=True)
        out = x - mean
        if normalize:
            var = m.mean(out * out, axis=axes, keepdims=True)
            out = out / m.sqrt(var + eps)
        return out

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: self._apply(
            node, inputs[0], np).astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        return {node.out_port: TValue(
            self._apply(node, x, jnp).astype(x.dtype), "L")}


@register
class ConvolutionBackpropData(Op):
    """opset1 ConvolutionBackpropData (transposed convolution) — the
    decoder op of segmentation/super-resolution IRs (U-Net, FCN,
    ESPCN upsampling heads).  Weights arrive as (Ci, Co, kH, kW) —
    TRANSPOSED relative to Convolution's (Co, Ci, kH, kW).

    out[h] covers (H-1)·stride + dilation·(k-1) + 1 positions, cropped
    by pads and extended by output_padding at the bottom/right:
    out_h = (H-1)·s − pb − pe + d·(k−1) + 1 + output_padding.

    The optional constant input 2 (spatial output_shape) is validated
    against the attr-derived shape; the auto_pad solve it implies in
    OpenVINO is not supported (explicit pads only — fail fast).

    TPU mapping: a fractionally-strided forward conv —
    lax.conv_general_dilated with lhs_dilation=strides and the kernel
    spatially flipped — so XLA lowers it onto the MXU exactly like a
    normal conv instead of a scatter (the numpy twin IS the scatter
    formulation, keeping the two implementations independent)."""

    type_name = "ConvolutionBackpropData"

    @staticmethod
    def _cfg(node):
        from pyopenvino_tpu.ir import attrs as A

        return (
            A.get_int_tuple(node.attrs, "strides", (1, 1)),
            A.get_int_tuple(node.attrs, "dilations", (1, 1)),
            A.get_int_tuple(node.attrs, "pads_begin", (0, 0)),
            A.get_int_tuple(node.attrs, "pads_end", (0, 0)),
            A.get_int_tuple(node.attrs, "output_padding", (0, 0)),
        )

    def _out_hw(self, node, in_hw, k_hw):
        (sh, sw), (dh, dw), pb, pe, op = self._cfg(node)
        oh = (in_hw[0] - 1) * sh - pb[0] - pe[0] + dh * (k_hw[0] - 1) + 1 + op[0]
        ow = (in_hw[1] - 1) * sw - pb[1] - pe[1] + dw * (k_hw[1] - 1) + 1 + op[1]
        if oh <= 0 or ow <= 0:
            raise ValueError(
                f"ConvolutionBackpropData {node.name}: non-positive output "
                f"{oh}x{ow} (pads exceed the dilated kernel span)")
        return oh, ow

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n, _, h, w = in_shapes[0]
        ci_w, co, kh, kw = in_shapes[1]
        if ci_w != in_shapes[0][1]:
            raise ValueError(
                f"ConvolutionBackpropData {node.name}: weight Ci {ci_w} != "
                f"input C {in_shapes[0][1]} (weights must be (Ci,Co,kH,kW))")
        oh, ow = self._out_hw(node, (h, w), (kh, kw))
        if 2 in in_shapes:
            tgt = in_values.get(2)
            if tgt is None:
                raise ValueError(
                    f"ConvolutionBackpropData {node.name}: output_shape "
                    "input must be constant")
            tgt = tuple(int(t) for t in np.asarray(tgt).reshape(-1))
            if tgt != (oh, ow):
                raise ValueError(
                    f"ConvolutionBackpropData {node.name}: output_shape "
                    f"{tgt} inconsistent with attrs-derived ({oh}, {ow}); "
                    "auto_pad solving is not supported")
        return ShapeResult({node.out_port: (n, co, oh, ow)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x, wgt = inputs[0], inputs[1]
        (sh, sw), (dh, dw), pb, pe, opad = self._cfg(node)
        n, ci, h, w = x.shape
        _, co, kh, kw = wgt.shape
        # Scatter formulation: full un-cropped canvas, one (Ci→Co)
        # contraction per kernel tap added at its dilated offset.
        fh = (h - 1) * sh + dh * (kh - 1) + 1
        fw = (w - 1) * sw + dw * (kw - 1) + 1
        # output_padding does NOT append zeros — it reduces the end-crop
        # (ONNX/torch semantics); the extra rows are computed values
        # wherever they still overlap the canvas, zeros only beyond it.
        buf = np.zeros((n, co, fh + opad[0], fw + opad[1]), np.float32)
        for i in range(kh):
            for j in range(kw):
                tap = np.einsum("nchw,co->nohw", x, wgt[:, :, i, j],
                                optimize=True)
                buf[:, :, i * dh: i * dh + (h - 1) * sh + 1: sh,
                    j * dw: j * dw + (w - 1) * sw + 1: sw] += tap
        out = buf[:, :, pb[0]: fh - pe[0] + opad[0],
                  pb[1]: fw - pe[1] + opad[1]]
        return {node.out_port: out.astype(x.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp
        from jax import lax

        x = inputs[0].nhwc()
        (sh, sw), (dh, dw), pb, pe, opad = self._cfg(node)
        tv_w = inputs[1]  # (Ci, Co, kh, kw); int8 + per-Co scale under int8w
        wgt = tv_w.arr
        if tv_w.qscale is not None:
            wgt = wgt.astype(jnp.float32) * tv_w.qscale
        kh, kw = wgt.shape[2], wgt.shape[3]
        # Flip spatial taps → HWIO (I=Ci, O=Co): the transposed conv is a
        # stride-1 conv over the lhs-dilated input with mirrored kernel.
        w_hwio = jnp.flip(wgt, axis=(2, 3)).transpose(2, 3, 0, 1)
        pad_h = (dh * (kh - 1) - pb[0], dh * (kh - 1) - pe[0] + opad[0])
        pad_w = (dw * (kw - 1) - pb[1], dw * (kw - 1) - pe[1] + opad[1])
        out = lax.conv_general_dilated(
            x,
            w_hwio.astype(x.dtype),
            window_strides=(1, 1),
            padding=(pad_h, pad_w),
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            # Same f32 MXU rule as Convolution.emit_fused: without
            # HIGHEST the TPU multiplies f32 in bf16.
            precision=(lax.Precision.HIGHEST
                       if x.dtype == jnp.float32
                       else lax.Precision.DEFAULT),
        )
        return {node.out_port: TValue(out.astype(x.dtype), "CL")}


@register
class Erf(_Unary):
    type_name = "Erf"

    def _apply_np(self, node, x):
        from scipy.special import erf as _erf  # scipy ships with jax stack

        return _erf(x).astype(x.dtype)

    def _apply_jx(self, node, x):
        import jax

        return jax.scipy.special.erf(x)


@register
class Log(_Unary):
    type_name = "Log"

    def _apply_np(self, node, x):
        return np.log(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.log(x)


@register
class Abs(_Unary):
    type_name = "Abs"

    def _apply_np(self, node, x):
        return np.abs(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.abs(x)


@register
class Negative(_Unary):
    type_name = "Negative"

    def _apply_np(self, node, x):
        return -x

    def _apply_jx(self, node, x):
        return -x


@register
class Floor(_Unary):
    type_name = "Floor"

    def _apply_np(self, node, x):
        return np.floor(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.floor(x)


@register
class Ceiling(_Unary):
    type_name = "Ceiling"

    def _apply_np(self, node, x):
        return np.ceil(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.ceil(x)


@register
class ReduceMin(_Reduce):
    type_name = "ReduceMin"
    np_fn = staticmethod(np.min)
    jnp_name = "min"


@register
class ReduceProd(_Reduce):
    type_name = "ReduceProd"
    np_fn = staticmethod(np.prod)
    jnp_name = "prod"


@register
class Tile(Op):
    """opset1 Tile: repeat `data` along each axis by the constant
    `repeats` (input 1).  numpy/OpenVINO rank rules agree: the shorter
    of (rank, len(repeats)) is left-padded with 1s."""

    type_name = "Tile"

    @staticmethod
    def _reps(source):
        if source is None:
            raise ValueError("Tile: repeats are not constant")
        reps = tuple(int(r) for r in np.asarray(source).reshape(-1))
        if any(r < 1 for r in reps):
            raise ValueError(f"Tile: repeats must be >= 1, got {reps}")
        return reps

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        reps = self._reps(in_values.get(1))
        shp = tuple(in_shapes[0])
        n = max(len(shp), len(reps))
        shp = (1,) * (n - len(shp)) + shp
        reps = (1,) * (n - len(reps)) + reps
        res = ShapeResult({node.out_port: tuple(
            d * r for d, r in zip(shp, reps))})
        if in_values.get(0) is not None:
            res.values[node.out_port] = np.tile(in_values[0], reps)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: np.tile(inputs[0], self._reps(inputs[1]))}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        return {node.out_port: TValue(
            jnp.tile(x, self._reps(ctx.static_value(node, 1))), "L")}


@register
class NormalizeL2(Op):
    """opset1 NormalizeL2: x / sqrt(reduce_sum(x^2, axes)) with eps
    combined per eps_mode ('add' -> sum+eps, 'max' -> max(sum, eps)).
    Axes are the constant input 1.  Common in SSD variants' feature-map
    L2 normalization (the reference engine has no such op)."""

    type_name = "NormalizeL2"

    @staticmethod
    def _cfg(node):
        eps = float(node.attrs.get("eps", 1e-10))
        mode = str(node.attrs.get("eps_mode", "add")).lower()
        if mode not in ("add", "max"):
            raise ValueError(f"NormalizeL2: unsupported eps_mode {mode!r}")
        return eps, mode

    @staticmethod
    def _axes(source, rank):
        if source is None:
            raise ValueError("NormalizeL2: axes are not constant")
        return tuple(sorted(
            _norm_axis(a, rank, "NormalizeL2")
            for a in np.asarray(source).reshape(-1)))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        self._cfg(node)  # validate early
        self._axes(in_values.get(1), len(in_shapes[0]))
        return ShapeResult({node.out_port: in_shapes[0]})

    def _apply(self, node, x, axes, m):
        eps, mode = self._cfg(node)
        ss = m.sum(x * x, axis=axes, keepdims=True)
        denom = m.sqrt(ss + eps) if mode == "add" else m.sqrt(
            m.maximum(ss, eps))
        return x / denom

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axes = self._axes(inputs[1], inputs[0].ndim)
        return {node.out_port: self._apply(
            node, inputs[0], axes, np).astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axes = self._axes(ctx.static_value(node, 1), x.ndim)
        return {node.out_port: TValue(
            self._apply(node, x, axes, jnp).astype(x.dtype), "L")}


@register
class FakeQuantize(Op):
    """opset1 FakeQuantize — the op POT/NNCF-quantized IRs are built
    from.  Inputs: x, input_low, input_high, output_low, output_high
    (1-4 broadcastable to x); attr `levels`.

        q = round((clamp(x, il, ih) - il) / (ih - il) * (levels-1))
        y = q / (levels-1) * (oh - ol) + ol

    Round is half-to-even, matching the OpenVINO runtime's nearbyint
    and numpy/jnp `round` exactly — the differential twins stay
    bit-comparable through the quantization grid."""

    type_name = "FakeQuantize"

    @staticmethod
    def _levels(node) -> int:
        levels = int(node.attrs.get("levels", 256))
        if levels < 2:
            raise ValueError(f"FakeQuantize: levels must be >= 2, "
                             f"got {levels}")
        return levels

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        self._levels(node)  # validate early
        out = tuple(np.broadcast_shapes(*in_shapes.values()))
        if out != tuple(in_shapes[0]):
            raise ValueError(
                f"FakeQuantize: ranges broadcast the data from "
                f"{tuple(in_shapes[0])} to {out}")
        return ShapeResult({node.out_port: out})

    def _apply(self, node, x, il, ih, ol, oh, m):
        steps = self._levels(node) - 1
        q = m.round(m.clip(x, il, ih) * (steps / (ih - il))
                    - il * (steps / (ih - il)))
        return q * ((oh - ol) / steps) + ol

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = self._apply(node, inputs[0], inputs[1], inputs[2],
                          inputs[3], inputs[4], np)
        return {node.out_port: out.astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        il, ih, ol, oh = (inputs[i].nchw() for i in (1, 2, 3, 4))
        return {node.out_port: TValue(
            self._apply(node, x, il, ih, ol, oh, jnp).astype(x.dtype),
            "L")}


class _BlockSpatial(Op):
    """Shared plumbing for DepthToSpace / SpaceToDepth: rank-4 NCHW
    reshape->transpose->reshape with a blocks_first (DCR) or
    depth_first (CRD) element order."""

    @staticmethod
    def _cfg(node):
        b = int(node.attrs.get("block_size", 1))
        if b < 1:
            raise ValueError(f"block_size must be >= 1, got {b}")
        mode = str(node.attrs.get("mode", "blocks_first")).lower()
        if mode not in ("blocks_first", "depth_first"):
            raise ValueError(f"unsupported mode {mode!r}")
        return b, mode

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: self._out_shape(
            node, in_shapes[0])})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: self._rearrange(node, inputs[0])}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        return {node.out_port: TValue(
            self._rearrange(node, inputs[0].nchw()), "L")}


@register
class DepthToSpace(_BlockSpatial):
    """opset1 DepthToSpace: (N, C, H, W) -> (N, C/b^2, H*b, W*b)."""

    type_name = "DepthToSpace"

    def _out_shape(self, node, s):
        b, _ = self._cfg(node)
        n, c, h, w = s
        if c % (b * b):
            raise ValueError(
                f"DepthToSpace: C={c} not divisible by block^2={b * b}")
        return (n, c // (b * b), h * b, w * b)

    def _rearrange(self, node, x):
        b, mode = self._cfg(node)
        n, c, h, w = x.shape
        co = c // (b * b)
        if mode == "blocks_first":  # DCR
            t = x.reshape(n, b, b, co, h, w).transpose(0, 3, 4, 1, 5, 2)
        else:                       # CRD
            t = x.reshape(n, co, b, b, h, w).transpose(0, 1, 4, 2, 5, 3)
        return t.reshape(n, co, h * b, w * b)


@register
class SpaceToDepth(_BlockSpatial):
    """opset1 SpaceToDepth: (N, C, H, W) -> (N, C*b^2, H/b, W/b)."""

    type_name = "SpaceToDepth"

    def _out_shape(self, node, s):
        b, _ = self._cfg(node)
        n, c, h, w = s
        if h % b or w % b:
            raise ValueError(
                f"SpaceToDepth: H={h}/W={w} not divisible by block={b}")
        return (n, c * b * b, h // b, w // b)

    def _rearrange(self, node, x):
        b, mode = self._cfg(node)
        n, c, h, w = x.shape
        xr = x.reshape(n, c, h // b, b, w // b, b)
        if mode == "blocks_first":
            t = xr.transpose(0, 3, 5, 1, 2, 4)
        else:
            t = xr.transpose(0, 1, 3, 5, 2, 4)
        return t.reshape(n, c * b * b, h // b, w // b)


@register
class Convert(Op):
    """opset1 Convert: element-wise cast to ``destination_type``.

    Ubiquitous in real MO output (FP16 IRs wrap every weight in
    Convert→f32; u8 input preprocessing starts with Convert) and the
    primitive behind the PrePostProcessor facade (preprocess.py).  The
    reference has no plugin for it — loading such an IR there exits at
    dispatch (inference_engine.py:270-272).  float→int rounds toward
    zero (OpenVINO spec semantics == C truncation, which both numpy and
    XLA's convert implement)."""

    type_name = "Convert"

    @staticmethod
    def _dest(node):
        from pyopenvino_tpu.ir.model import ELEMENT_TYPE_TO_DTYPE

        name = node.attrs.get("destination_type")
        if name not in ELEMENT_TYPE_TO_DTYPE:
            raise ValueError(
                f"Convert {node.name}: unsupported destination_type "
                f"{name!r} (supported: {sorted(ELEMENT_TYPE_TO_DTYPE)})")
        return np.dtype(ELEMENT_TYPE_TO_DTYPE[name])

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        res = ShapeResult({node.out_port: in_shapes[0]})
        if in_values.get(0) is not None:
            # constant folding: ShapeOf→Convert chains and FP16 weight
            # unwrapping fold to a typed literal at compile time
            res.values[node.out_port] = np.asarray(
                in_values[0]).astype(self._dest(node))
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: np.asarray(inputs[0]).astype(self._dest(node))}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        tv = inputs[0]
        dest = self._dest(node)
        # Floating destinations land on the configured compute dtype (the
        # traced pipeline carries f32-or-bf16 per Config.compute_dtype;
        # Result nodes cast to the declared output dtype at the end) —
        # integer/bool destinations are exact.
        if np.issubdtype(dest, np.floating):
            out = tv.arr.astype(ctx.compute_dtype)
        else:
            out = tv.arr.astype(dest)
        return {node.out_port: TValue(out, tv.layout)}


@register
class Select(Op):
    """opset1 Select: elementwise cond ? then : else with numpy
    broadcasting — the ternary real exported IRs use for masking
    (e.g. YOLO post-blocks, padded-sequence switches)."""

    type_name = "Select"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        shape = tuple(
            int(d) for d in np.broadcast_shapes(*in_shapes.values())
        )
        res = ShapeResult({node.out_port: shape})
        if all(in_values.get(i) is not None for i in range(3)):
            res.values[node.out_port] = np.where(
                np.asarray(in_values[0], bool), in_values[1], in_values[2]
            )
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: np.where(
            np.asarray(inputs[0], bool), inputs[1], inputs[2])}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        cond, a, b = (inputs[i].nchw() for i in range(3))
        return {node.out_port: TValue(
            jnp.where(cond.astype(bool), a, b), "L")}


@register
class TopK(Op):
    """opset3 TopK: k largest/smallest along an axis → (values, indices).
    k (input 1) must be static — XLA needs static shapes; a data-dependent
    k has no compiled representation (the same contract as Reshape
    targets).  Ties resolve to the LOWER index in both executors
    (numpy stable argsort == lax.top_k tie order)."""

    type_name = "TopK"

    @staticmethod
    def _params(node):
        from pyopenvino_tpu.ir import attrs as A

        return (
            A.get_int(node.attrs, "axis"),
            A.get_str(node.attrs, "mode", "max"),
            A.get_str(node.attrs, "sort", "value"),
            A.get_str(node.attrs, "index_element_type", "i32"),
        )

    def _ports(self, node):
        ports = sorted(node.outputs)
        if len(ports) == 2:
            return ports
        return [node.out_port, node.out_port + 1]

    @staticmethod
    def _k(in_values):
        k = in_values.get(1)
        if k is None:
            raise ValueError("TopK: k (input 1) must be a constant")
        return int(np.asarray(k).reshape(()))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axis, _, _, _ = self._params(node)
        rank = len(in_shapes[0])
        axis = _norm_axis(axis, rank, "TopK")
        k = self._k(in_values)
        shape = list(in_shapes[0])
        if k > shape[axis]:
            raise ValueError(
                f"TopK: k={k} exceeds axis extent {shape[axis]}")
        shape[axis] = k
        vports = self._ports(node)
        return ShapeResult({p: tuple(shape) for p in vports})

    def _select_np(self, x, k, axis, mode, sort):
        if mode != "max":
            key = x
        elif np.issubdtype(x.dtype, np.integer):
            # -x wraps for unsigned (and INT_MIN); ~x is the same strictly
            # decreasing reorder with no overflow on any integer dtype.
            key = ~x
        else:
            key = -x
        order = np.argsort(key, axis=axis, kind="stable")
        idx = np.take(order, np.arange(k), axis=axis)
        if sort == "index":
            idx = np.sort(idx, axis=axis)
        vals = np.take_along_axis(x, idx, axis=axis)
        return vals, idx

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axis, mode, sort, itype = self._params(node)
        x = inputs[0]
        axis = _norm_axis(axis, x.ndim, "TopK")
        k = self._k({1: inputs[1]})
        vals, idx = self._select_np(x, k, axis, mode, sort)
        dt = np.int64 if itype == "i64" else np.int32
        vp, ip = self._ports(node)
        return {vp: vals, ip: idx.astype(dt)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        axis, mode, sort, itype = self._params(node)
        x = inputs[0].nchw()
        axis = _norm_axis(axis, x.ndim, "TopK")
        k = self._k({1: ctx.static_value(node, 1)})
        xm = jnp.moveaxis(x, axis, -1)
        if mode == "max":
            vals, idx = jax.lax.top_k(xm, k)
        elif jnp.issubdtype(xm.dtype, jnp.integer):
            # negation wraps mod 2^n for unsigned / INT_MIN; bit-flip is the
            # overflow-free order reversal, then gather true values by index.
            _, idx = jax.lax.top_k(~xm, k)
            vals = jnp.take_along_axis(xm, idx, axis=-1)
        else:
            nv, idx = jax.lax.top_k(-xm, k)
            vals = -nv
        if sort == "index":
            idx_sorted = jnp.sort(idx, axis=-1)
            vals = jnp.take_along_axis(
                jnp.moveaxis(x, axis, -1), idx_sorted, axis=-1)
            idx = idx_sorted
        dt = jnp.int64 if itype == "i64" else jnp.int32
        vp, ip = self._ports(node)
        return {
            vp: TValue(jnp.moveaxis(vals, -1, axis), "L"),
            ip: TValue(jnp.moveaxis(idx, -1, axis).astype(dt), "L"),
        }


def _cmp(np_ufunc, jnp_name):
    """Comparison/logical dual fn: bool output either way."""
    def fn(a, b):
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
            return np_ufunc(a, b)
        import jax.numpy as jnp

        return getattr(jnp, jnp_name)(a, b)
    return staticmethod(fn)


# opset1 comparison set — bool outputs, numpy broadcasting; the mask
# producers feeding Select in exported graphs (none exist in the
# reference's op_plugins/).
@register
class Equal(_Binary):
    type_name = "Equal"
    np_fn = _cmp(np.equal, "equal")


@register
class NotEqual(_Binary):
    type_name = "NotEqual"
    np_fn = _cmp(np.not_equal, "not_equal")


@register
class Greater(_Binary):
    type_name = "Greater"
    np_fn = _cmp(np.greater, "greater")


@register
class GreaterEqual(_Binary):
    type_name = "GreaterEqual"
    np_fn = _cmp(np.greater_equal, "greater_equal")


@register
class Less(_Binary):
    type_name = "Less"
    np_fn = _cmp(np.less, "less")


@register
class LessEqual(_Binary):
    type_name = "LessEqual"
    np_fn = _cmp(np.less_equal, "less_equal")


@register
class LogicalAnd(_Binary):
    type_name = "LogicalAnd"
    np_fn = _cmp(np.logical_and, "logical_and")


@register
class LogicalOr(_Binary):
    type_name = "LogicalOr"
    np_fn = _cmp(np.logical_or, "logical_or")


@register
class LogicalXor(_Binary):
    type_name = "LogicalXor"
    np_fn = _cmp(np.logical_xor, "logical_xor")


@register
class LogicalNot(_Unary):
    type_name = "LogicalNot"

    def _apply_np(self, node, x):
        return np.logical_not(x)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.logical_not(x)


@register
class GatherND(Op):
    """GatherND: gather slices addressed by the trailing dim of
    ``indices``, with ``batch_dims`` leading axes shared — the
    coordinate-addressed gather TF-exported detection post-blocks use.
    opset8 keeps the batch dims in the output; an IR declaring
    version="opset5" gets the old flattened-batch layout (the parser
    retains the layer version as the ``_opset`` attr)."""

    type_name = "GatherND"

    @staticmethod
    def _bd(node) -> int:
        from pyopenvino_tpu.ir import attrs as A

        return A.get_int(node.attrs, "batch_dims", 0)

    @staticmethod
    def _flat5(node) -> bool:
        return node.attrs.get("_opset") == "opset5"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        data, idx = in_shapes[0], in_shapes[1]
        bd = self._bd(node)
        k = idx[-1]
        if bd + k > len(data):
            raise ValueError(
                f"GatherND: indices depth {k} + batch_dims {bd} exceeds "
                f"data rank {len(data)}")
        out = tuple(idx[:-1]) + tuple(data[bd + k:])
        if bd and self._flat5(node):  # opset5: batch dims flatten
            out = (int(np.prod(out[:bd])),) + tuple(out[bd:])
        return ShapeResult({node.out_port: out})

    @staticmethod
    def _gather(xp, data, idx, bd):
        k = idx.shape[-1]
        if bd == 0:
            tup = tuple(idx[..., i] for i in range(k))
            return data[tup]
        # batch_dims: flatten the shared leading axes, offset indices
        b = int(np.prod(data.shape[:bd]))
        dflat = data.reshape((b,) + tuple(data.shape[bd:]))
        iflat = idx.reshape((b,) + tuple(idx.shape[bd:]))
        brange = xp.arange(b).reshape((b,) + (1,) * (iflat.ndim - 2))
        tup = (xp.broadcast_to(brange, iflat.shape[:-1]),) + tuple(
            iflat[..., i] for i in range(k))
        out = dflat[tup]
        return out.reshape(
            tuple(idx.shape[:-1]) + tuple(data.shape[bd + k:]))

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        bd = self._bd(node)
        out = self._gather(
            np, inputs[0], np.asarray(inputs[1], np.int64), bd)
        if bd and self._flat5(node):
            out = out.reshape((-1,) + out.shape[bd:])
        return {node.out_port: out}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        bd = self._bd(node)
        out = self._gather(
            jnp, inputs[0].nchw(),
            inputs[1].nchw().astype(jnp.int32), bd)
        if bd and self._flat5(node):
            out = out.reshape((-1,) + out.shape[bd:])
        return {node.out_port: TValue(out, "L")}


@register
class GatherElements(Op):
    """opset6 GatherElements: per-element take_along_axis."""

    type_name = "GatherElements"

    @staticmethod
    def _axis(node, rank):
        from pyopenvino_tpu.ir import attrs as A

        return _norm_axis(A.get_int(node.attrs, "axis", 0), rank,
                          "GatherElements")

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        data, idx = in_shapes[0], in_shapes[1]
        ax = self._axis(node, len(data))
        if len(idx) != len(data) or any(
            i != ax and idx[i] != data[i] for i in range(len(data))
        ):
            raise ValueError(
                f"GatherElements: indices shape {tuple(idx)} must match "
                f"data {tuple(data)} on every axis except {ax}")
        return ShapeResult({node.out_port: in_shapes[1]})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        ax = self._axis(node, inputs[0].ndim)
        return {node.out_port: np.take_along_axis(
            inputs[0], np.asarray(inputs[1], np.int64), axis=ax)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        ax = self._axis(node, len(inputs[0].shape))
        out = jnp.take_along_axis(
            inputs[0].nchw(), inputs[1].nchw().astype(jnp.int32), axis=ax)
        return {node.out_port: TValue(out, "L")}


@register
class ScatterNDUpdate(Op):
    """opset4 ScatterNDUpdate: data with slices at ``indices`` replaced
    by ``updates`` — the write-side sibling of GatherND."""

    type_name = "ScatterNDUpdate"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        data, idx, upd = (in_shapes[i] for i in range(3))
        k = idx[-1]
        if k > len(data):
            raise ValueError(
                f"ScatterNDUpdate: indices depth {k} exceeds data rank "
                f"{len(data)}")
        want = tuple(idx[:-1]) + tuple(data[k:])
        if tuple(upd) != want:
            raise ValueError(
                f"ScatterNDUpdate: updates shape {tuple(upd)} != "
                f"{want} implied by data/indices")
        return ShapeResult({node.out_port: data})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        data = np.array(inputs[0])
        idx = np.asarray(inputs[1], np.int64)
        tup = tuple(idx[..., i] for i in range(idx.shape[-1]))
        data[tup] = inputs[2]
        return {node.out_port: data}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        data = inputs[0].nchw()
        idx = inputs[1].nchw().astype(jnp.int32)
        upd = inputs[2].nchw().astype(data.dtype)
        tup = tuple(idx[..., i] for i in range(idx.shape[-1]))
        return {node.out_port: TValue(data.at[tup].set(upd), "L")}


@register
class ReduceL1(_Reduce):
    type_name = "ReduceL1"
    np_fn = staticmethod(
        lambda x, axis, keepdims: np.sum(np.abs(x), axis=axis,
                                         keepdims=keepdims))

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axes = self._axes(ctx.static_value(node, 1), x.ndim)
        out = jnp.sum(jnp.abs(x), axis=axes, keepdims=self._keep(node))
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


@register
class ReduceL2(_Reduce):
    type_name = "ReduceL2"
    np_fn = staticmethod(
        lambda x, axis, keepdims: np.sqrt(
            np.sum(np.square(x), axis=axis, keepdims=keepdims)))

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axes = self._axes(ctx.static_value(node, 1), x.ndim)
        out = jnp.sqrt(jnp.sum(jnp.square(x), axis=axes,
                               keepdims=self._keep(node)))
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


@register
class Broadcast(Op):
    """opset3 Broadcast — numpy, bidirectional, AND explicit modes
    (static target shape; explicit's axes_mapping is input 2: each input
    dim is pinned to the named target dim, all others tile)."""

    type_name = "Broadcast"

    @staticmethod
    def _mode(node) -> str:
        from pyopenvino_tpu.ir import attrs as A

        mode = A.get_str(node.attrs, "mode", "numpy")
        if mode not in ("numpy", "bidirectional", "explicit"):
            raise ValueError(f"Broadcast: unknown mode {mode!r}")
        return mode

    def _target(self, node, in_shape, tval):
        if tval is None:
            raise ValueError("Broadcast: target shape must be constant")
        t = tuple(int(d) for d in np.asarray(tval).reshape(-1))
        if self._mode(node) == "bidirectional":
            return tuple(int(d) for d in np.broadcast_shapes(in_shape, t))
        return t

    @staticmethod
    def _explicit_plan(in_shape, target, aval):
        """(input permutation, interim shape): transpose the input into
        ascending-target-axis order (a plain reshape CANNOT permute —
        an unsorted axes_mapping like (1, 0) would silently scramble the
        data), then reshape to the 1-padded interim and broadcast."""
        if aval is None:
            raise ValueError(
                "Broadcast explicit: axes_mapping (input 2) must be "
                "constant")
        axes = tuple(int(a) for a in np.asarray(aval).reshape(-1))
        if len(axes) != len(in_shape):
            raise ValueError(
                f"Broadcast explicit: axes_mapping {axes} rank != input "
                f"{in_shape}")
        if len(set(axes)) != len(axes):
            raise ValueError(
                f"Broadcast explicit: duplicate axes in {axes}")
        perm = tuple(int(i) for i in np.argsort(axes))
        interim = [1] * len(target)
        for a, d in zip(axes, in_shape):
            if not 0 <= a < len(target):
                raise ValueError(
                    f"Broadcast explicit: axis {a} out of range for "
                    f"{target}")
            if target[a] != d and d != 1:
                raise ValueError(
                    f"Broadcast explicit: input dim {d} pinned to target "
                    f"axis {a} of extent {target[a]}")
            interim[a] = d
        return perm, tuple(interim)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        out = self._target(node, in_shapes[0], in_values.get(1))
        if self._mode(node) == "explicit":
            self._explicit_plan(in_shapes[0], out, in_values.get(2))
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None:
            v = in_values[0]
            if self._mode(node) == "explicit":
                perm, interim = self._explicit_plan(
                    v.shape, out, in_values.get(2))
                v = np.transpose(v, perm).reshape(interim)
            res.values[node.out_port] = np.broadcast_to(v, out)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x = inputs[0]
        out = self._target(node, x.shape, inputs[1])
        if self._mode(node) == "explicit":
            perm, interim = self._explicit_plan(
                x.shape, out, inputs.get(2))
            x = np.transpose(x, perm).reshape(interim)
        return {node.out_port: np.ascontiguousarray(
            np.broadcast_to(x, out))}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        out = self._target(node, x.shape, ctx.static_value(node, 1))
        if self._mode(node) == "explicit":
            perm, interim = self._explicit_plan(
                x.shape, out, ctx.static_value(node, 2))
            x = jnp.transpose(x, perm).reshape(interim)
        return {node.out_port: TValue(jnp.broadcast_to(x, out), "L")}


@register
class Range(Op):
    """opset4 Range over constant bounds — always constant-folded (the
    shape-arithmetic producer in exported post-blocks)."""

    type_name = "Range"

    @staticmethod
    def _fold(in_values, node):
        vals = [in_values.get(i) for i in range(3)]
        if any(v is None for v in vals):
            raise ValueError(
                f"Range {node.name}: start/stop/step must be constant")
        start, stop, step = (float(np.asarray(v).reshape(())) for v in vals)
        from pyopenvino_tpu.ir import attrs as A
        from pyopenvino_tpu.ir.model import ELEMENT_TYPE_TO_DTYPE

        dt = np.dtype(ELEMENT_TYPE_TO_DTYPE[
            A.get_str(node.attrs, "output_type", "f32")])
        return np.arange(start, stop, step).astype(dt)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        out = self._fold(in_values, node)
        res = ShapeResult({node.out_port: out.shape})
        res.values[node.out_port] = out
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: self._fold(inputs, node)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        vals = {i: ctx.static_value(node, i) for i in range(3)}
        return {node.out_port: TValue(
            jnp.asarray(self._fold(vals, node)), "L")}


@register
class CumSum(Op):
    """opset3 CumSum along a constant axis, exclusive/reverse attrs."""

    type_name = "CumSum"

    @staticmethod
    def _flags(node):
        from pyopenvino_tpu.ir import attrs as A

        return (A.get_bool(node.attrs, "exclusive", False),
                A.get_bool(node.attrs, "reverse", False))

    @staticmethod
    def _axis(source, rank):
        if source is None:
            return 0  # axis input is optional; spec default 0
        return _norm_axis(source, rank, "CumSum")

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: in_shapes[0]})

    def _apply(self, xp, x, axis, exclusive, reverse):
        if reverse:
            x = xp.flip(x, axis=axis)
        out = xp.cumsum(x, axis=axis)
        if exclusive:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (1, 0)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, x.shape[axis])
            out = xp.pad(out, pad)[tuple(sl)]
        if reverse:
            out = xp.flip(out, axis=axis)
        return out

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        ex, rev = self._flags(node)
        ax = self._axis(inputs.get(1), inputs[0].ndim)
        # native dtype: a float64 round-trip would corrupt wide int64
        # values and diverge from the compiled path's native cumsum
        out = self._apply(np, inputs[0], ax, ex, rev)
        return {node.out_port: out.astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        ex, rev = self._flags(node)
        x = inputs[0].nchw()
        ax = self._axis(
            ctx.static_value(node, 1) if 1 in node.inputs else None, x.ndim)
        out = self._apply(jnp, x, ax, ex, rev)
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


def _s2b_compute(xp, x, block, pads_begin, pads_end):
    """SpaceToBatch core shared by both twins: pad, split each dim by its
    block factor, move the factors into batch (TF space_to_batch_nd
    semantics generalized to any rank; block[0] == 1 per spec)."""
    rank = x.ndim
    pad = [(int(pads_begin[i]), int(pads_end[i])) for i in range(rank)]
    xpad = xp.pad(x, pad)
    s = xpad.shape
    # interleave: (s0, s1/b1, b1, s2/b2, b2, ...)
    split = [s[0]]
    for i in range(1, rank):
        split += [s[i] // int(block[i]), int(block[i])]
    y = xpad.reshape(split)
    # block factors (positions 2i) to the front, then s0, then quotients
    perm = ([2 * i for i in range(1, rank)] + [0]
            + [2 * i - 1 for i in range(1, rank)])
    y = xp.transpose(y, perm)
    out_shape = [int(np.prod([int(b) for b in block])) * s[0]]
    out_shape += [s[i] // int(block[i]) for i in range(1, rank)]
    return y.reshape(out_shape)


def _b2s_compute(xp, x, block, crops_begin, crops_end):
    """BatchToSpace core (inverse of _s2b_compute)."""
    rank = x.ndim
    nb = int(np.prod([int(b) for b in block]))
    n0 = x.shape[0] // nb
    lead = [int(block[i]) for i in range(1, rank)] + [n0]
    y = x.reshape(lead + list(x.shape[1:]))
    # (b1..b_{R-1}, n0, d1..d_{R-1}) → (n0, d1, b1, d2, b2, ...)
    perm = [rank - 1] + [v for i in range(1, rank)
                         for v in (rank - 1 + i, i - 1)]
    y = xp.transpose(y, perm)
    merged = [n0] + [x.shape[i] * int(block[i]) for i in range(1, rank)]
    y = y.reshape(merged)
    sl = [slice(None)] + [
        slice(int(crops_begin[i]),
              merged[i] - int(crops_end[i]))
        for i in range(1, rank)]
    return y[tuple(sl)]


class _BlockOp(Op):
    """Shared plumbing for SpaceToBatch/BatchToSpace: three I64 const
    inputs (block_shape, begin, end)."""

    core = None  # _s2b_compute or _b2s_compute

    @staticmethod
    def _consts(node, vals):
        out = []
        for i in (1, 2, 3):
            v = vals.get(i)
            if v is None:
                raise ValueError(
                    f"{node.op_type} {node.name}: input {i} must be "
                    "constant")
            out.append(np.asarray(v, np.int64).reshape(-1))
        return out

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        block, b0, b1 = self._consts(node, inputs)
        return {node.out_port: type(self).core(np, inputs[0], block, b0, b1)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        block, b0, b1 = self._consts(
            node, {i: ctx.static_value(node, i) for i in (1, 2, 3)})
        return {node.out_port: TValue(
            type(self).core(jnp, inputs[0].nchw(), block, b0, b1), "L")}


@register
class SpaceToBatch(_BlockOp):
    type_name = "SpaceToBatch"
    core = staticmethod(_s2b_compute)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        block, pb, pe = self._consts(node, in_values)
        shape = in_shapes[0]
        if int(block[0]) != 1 or int(pb[0]) or int(pe[0]):
            raise ValueError(
                f"SpaceToBatch {node.name}: block[0] must be 1 and the "
                "batch dim unpadded (spec)")
        out = [int(np.prod(block)) * shape[0]]
        for i in range(1, len(shape)):
            padded = shape[i] + int(pb[i]) + int(pe[i])
            if padded % int(block[i]):
                raise ValueError(
                    f"SpaceToBatch {node.name}: padded dim {i} = {padded} "
                    f"not divisible by block {int(block[i])}")
            out.append(padded // int(block[i]))
        return ShapeResult({node.out_port: tuple(out)})


@register
class BatchToSpace(_BlockOp):
    type_name = "BatchToSpace"
    core = staticmethod(_b2s_compute)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        block, cb, ce = self._consts(node, in_values)
        shape = in_shapes[0]
        nb = int(np.prod(block))
        if int(block[0]) != 1 or int(cb[0]) or int(ce[0]):
            raise ValueError(
                f"BatchToSpace {node.name}: block[0] must be 1 and the "
                "batch dim uncropped (spec)")
        if shape[0] % nb:
            raise ValueError(
                f"BatchToSpace {node.name}: batch {shape[0]} not "
                f"divisible by prod(block) {nb}")
        out = [shape[0] // nb]
        for i in range(1, len(shape)):
            out.append(shape[i] * int(block[i]) - int(cb[i]) - int(ce[i]))
        return ShapeResult({node.out_port: tuple(out)})


def _einsum_out_shape(eq, shapes):
    """Label-based einsum output shape (no tensor materialization —
    shape inference runs per compile/interpret pass, so evaluating the
    contraction on dummies would cost real FLOPs and peak-sized
    allocations).  Supports explicit and implicit outputs and one
    ellipsis per operand with numpy broadcasting."""
    if "->" in eq:
        lhs, rhs = eq.split("->")
    else:
        lhs, rhs = eq, None
    terms = lhs.split(",")
    if len(terms) != len(shapes):
        raise ValueError(
            f"{len(terms)} equation operands != {len(shapes)} inputs")
    dims = {}
    batch_shape = ()
    counts = {}
    for term, shape in zip(terms, shapes):
        if "..." in term:
            head, tail = term.split("...")
            labels = list(head) + list(tail)
            if len(labels) > len(shape):
                raise ValueError(f"term {term!r} too long for {shape}")
            n_ell = len(shape) - len(labels)
            ell = shape[len(head):len(head) + n_ell]
            batch_shape = tuple(
                int(d) for d in np.broadcast_shapes(batch_shape, ell))
            axes = list(shape[:len(head)]) + list(shape[len(head) + n_ell:])
        else:
            labels = list(term)
            if len(labels) != len(shape):
                raise ValueError(f"term {term!r} rank != {shape}")
            axes = list(shape)
        for lab, d in zip(labels, axes):
            # np.einsum/jnp.einsum reject size-1 "broadcast" of a repeated
            # label, so shape inference must too — accepting it here would
            # only defer the failure to compute time with a worse error.
            if lab in dims and dims[lab] != d:
                raise ValueError(
                    f"label {lab!r} bound to both {dims[lab]} and {d}")
            dims[lab] = int(d)
            counts[lab] = counts.get(lab, 0) + 1
    if rhs is None:
        rhs = ("..." if any("..." in t for t in terms) else "") + "".join(
            sorted(lab for lab, c in counts.items() if c == 1))
    out = []
    for part in rhs.split("..."):
        out.append(tuple(dims[lab] if lab in dims else _raise_lab(lab)
                         for lab in part))
    if "..." in rhs:
        return out[0] + batch_shape + out[1]
    return out[0]


def _raise_lab(lab):
    raise ValueError(f"output label {lab!r} not present in inputs")


@register
class Einsum(Op):
    """opset7 Einsum over any number of inputs (transformer-export
    contractions).  Output shapes come from label arithmetic
    (_einsum_out_shape) — nothing is materialized at shape-inference
    time."""

    type_name = "Einsum"

    @staticmethod
    def _eq(node) -> str:
        from pyopenvino_tpu.ir import attrs as A

        return A.get_str(node.attrs, "equation").replace(" ", "")

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        shapes = [tuple(in_shapes[i]) for i in sorted(in_shapes)]
        try:
            out = _einsum_out_shape(self._eq(node), shapes)
        except ValueError as e:
            raise ValueError(
                f"Einsum {node.name}: bad equation "
                f"{self._eq(node)!r} for input shapes {shapes}: {e}")
        return ShapeResult({node.out_port: out})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        arrs = [inputs[i] for i in sorted(inputs)]
        out = np.einsum(self._eq(node), *arrs, optimize=True)
        return {node.out_port: np.asarray(out, dtype=arrs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp
        from jax import lax

        arrs = [inputs[i].nchw() for i in sorted(inputs)]
        out = jnp.einsum(
            self._eq(node), *arrs,
            preferred_element_type=jnp.float32,
            # f32 means full f32: without HIGHEST the TPU MXU contracts
            # in bf16 and the interpreter twin diverges by ~3e-2 (the
            # same rule as conv/matmul)
            precision=(lax.Precision.HIGHEST
                       if arrs[0].dtype == jnp.float32
                       else lax.Precision.DEFAULT))
        return {node.out_port: TValue(out.astype(arrs[0].dtype), "L")}


@register
class HardSigmoid(Op):
    """opset1 HardSigmoid: clamp(alpha·x + beta, 0, 1) with alpha/beta
    as const inputs 1 and 2 (distinct from opset5's HSigmoid, which
    fixes the 1/6, 1/2 coefficients)."""

    type_name = "HardSigmoid"

    @staticmethod
    def _ab(vals, node):
        a, b = vals.get(1), vals.get(2)
        if a is None or b is None:
            raise ValueError(
                f"HardSigmoid {node.name}: alpha/beta must be constant")
        return (float(np.asarray(a).reshape(())),
                float(np.asarray(b).reshape(())))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: in_shapes[0]})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        a, b = self._ab(inputs, node)
        return {node.out_port: np.clip(
            a * inputs[0] + b, 0.0, 1.0).astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        a, b = self._ab(
            {i: ctx.static_value(node, i) for i in (1, 2)}, node)
        x = inputs[0].arr
        return {node.out_port: TValue(
            jnp.clip(a * x + b, 0.0, 1.0), inputs[0].layout)}


@register
class LogSoftmax(Op):
    """opset5 LogSoftmax along an axis attr (max-subtracted, stable)."""

    type_name = "LogSoftmax"

    @staticmethod
    def _axis(node, rank):
        from pyopenvino_tpu.ir import attrs as A

        # opset5 default axis is 1, like this repo's SoftMax
        return _norm_axis(A.get_int(node.attrs, "axis", 1), rank,
                          "LogSoftmax")

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        self._axis(node, len(in_shapes[0]))
        return ShapeResult({node.out_port: in_shapes[0]})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        ax = self._axis(node, inputs[0].ndim)
        x = inputs[0].astype(np.float64)
        m = x.max(axis=ax, keepdims=True)
        z = x - m
        out = z - np.log(np.exp(z).sum(axis=ax, keepdims=True))
        return {node.out_port: out.astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax

        ax = self._axis(node, len(inputs[0].shape))
        x = inputs[0].nchw()
        return {node.out_port: TValue(
            jax.nn.log_softmax(x, axis=ax), "L")}


@register
class Sin(_UnaryAttr):
    type_name = "Sin"

    def _formula(self, node, x, m):
        return m.sin(x)

@register
class Cos(_UnaryAttr):
    type_name = "Cos"

    def _formula(self, node, x, m):
        return m.cos(x)

@register
class Tan(_UnaryAttr):
    type_name = "Tan"

    def _formula(self, node, x, m):
        return m.tan(x)

@register
class Asin(_UnaryAttr):
    type_name = "Asin"

    def _formula(self, node, x, m):
        return m.arcsin(x)

@register
class Acos(_UnaryAttr):
    type_name = "Acos"

    def _formula(self, node, x, m):
        return m.arccos(x)

@register
class Atan(_UnaryAttr):
    type_name = "Atan"

    def _formula(self, node, x, m):
        return m.arctan(x)

@register
class Sinh(_UnaryAttr):
    type_name = "Sinh"

    def _formula(self, node, x, m):
        return m.sinh(x)

@register
class Cosh(_UnaryAttr):
    type_name = "Cosh"

    def _formula(self, node, x, m):
        return m.cosh(x)

@register
class Asinh(_UnaryAttr):
    type_name = "Asinh"

    def _formula(self, node, x, m):
        return m.arcsinh(x)

@register
class Acosh(_UnaryAttr):
    type_name = "Acosh"

    def _formula(self, node, x, m):
        return m.arccosh(x)

@register
class Atanh(_UnaryAttr):
    type_name = "Atanh"

    def _formula(self, node, x, m):
        return m.arctanh(x)

@register
class Sign(_UnaryAttr):
    type_name = "Sign"

    def _formula(self, node, x, m):
        return m.sign(x)

@register
class Round(_UnaryAttr):
    """opset5 Round.  half_to_even (banker's, the default) is numpy/jax
    rint; half_away_from_zero is sign(x)·floor(|x| + 0.5) — exact at the
    .5 ties in both executors (fp addition of 0.5 to a representable
    half-integer is exact below 2^52/2^23)."""

    type_name = "Round"

    @staticmethod
    def _mode(node):
        from pyopenvino_tpu.ir import attrs as A

        mode = A.get_str(node.attrs, "mode", "half_to_even")
        if mode not in ("half_to_even", "half_away_from_zero"):
            raise ValueError(f"Round: unknown mode {mode!r}")
        return mode

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        self._mode(node)
        return super().infer_shapes(node, in_shapes, in_values)

    def _formula(self, node, x, m):
        if self._mode(node) == "half_to_even":
            return m.rint(x)
        return m.sign(x) * m.floor(m.abs(x) + 0.5)


@register
class ShuffleChannels(Op):
    """opset1 ShuffleChannels: the fused channel-shuffle MO emits for
    ShuffleNet IRs (our programmatic family spells it as
    reshape/transpose; exported IRs carry this op)."""

    type_name = "ShuffleChannels"

    @staticmethod
    def _ag(node, rank):
        from pyopenvino_tpu.ir import attrs as A

        axis = _norm_axis(A.get_int(node.attrs, "axis", 1), rank,
                          "ShuffleChannels")
        return axis, A.get_int(node.attrs, "group", 1)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axis, g = self._ag(node, len(in_shapes[0]))
        if in_shapes[0][axis] % g:
            raise ValueError(
                f"ShuffleChannels {node.name}: axis extent "
                f"{in_shapes[0][axis]} not divisible by group {g}")
        return ShapeResult({node.out_port: in_shapes[0]})

    @staticmethod
    def _shuffle(xp, x, axis, g):
        s = x.shape
        split = s[:axis] + (g, s[axis] // g) + s[axis + 1:]
        perm = list(range(len(split)))
        perm[axis], perm[axis + 1] = perm[axis + 1], perm[axis]
        return xp.transpose(x.reshape(split), perm).reshape(s)

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axis, g = self._ag(node, inputs[0].ndim)
        return {node.out_port: self._shuffle(np, inputs[0], axis, g)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        axis, g = self._ag(node, x.ndim)
        return {node.out_port: TValue(self._shuffle(jnp, x, axis, g), "L")}


@register
class Selu(Op):
    """opset1 Selu: alpha/lambda as const inputs 1 and 2."""

    type_name = "Selu"

    @staticmethod
    def _al(vals, node):
        a, l = vals.get(1), vals.get(2)
        if a is None or l is None:
            raise ValueError(
                f"Selu {node.name}: alpha/lambda must be constant")
        return (float(np.asarray(a).reshape(())),
                float(np.asarray(l).reshape(())))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: in_shapes[0]})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        a, l = self._al(inputs, node)
        x = inputs[0]
        out = l * np.where(x > 0, x, a * (np.exp(np.minimum(x, 0)) - 1))
        return {node.out_port: out.astype(x.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        a, l = self._al(
            {i: ctx.static_value(node, i) for i in (1, 2)}, node)
        x = inputs[0].arr
        out = l * jnp.where(x > 0, x, a * (jnp.exp(jnp.minimum(x, 0)) - 1))
        return {node.out_port: TValue(out, inputs[0].layout)}


@register
class SoftSign(_UnaryAttr):
    """opset9 SoftSign: x / (1 + |x|)."""

    type_name = "SoftSign"

    def _formula(self, node, x, m):
        return x / (1.0 + m.abs(x))


@register
class FloorMod(_Binary):
    """opset1 FloorMod: remainder with the divisor's sign (python %)."""

    type_name = "FloorMod"
    np_fn = _cmp(np.mod, "mod")


@register
class Mod(_Binary):
    """opset1 Mod: C-style truncated remainder (dividend's sign)."""

    type_name = "Mod"

    @staticmethod
    def np_fn(a, b):
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
            return np.fmod(a, b)
        import jax.numpy as jnp

        return jnp.fmod(a, b)


@register
class SquaredDifference(_Binary):
    type_name = "SquaredDifference"

    @staticmethod
    def np_fn(a, b):
        d = a - b
        return d * d


@register
class ReverseSequence(Op):
    """opset1 ReverseSequence: per-batch-row, reverse the first
    seq_lengths[b] elements along seq_axis (the bidirectional-RNN
    export helper)."""

    type_name = "ReverseSequence"

    @staticmethod
    def _axes(node, rank):
        from pyopenvino_tpu.ir import attrs as A

        return (_norm_axis(A.get_int(node.attrs, "batch_axis", 0), rank,
                           "ReverseSequence"),
                _norm_axis(A.get_int(node.attrs, "seq_axis", 1), rank,
                           "ReverseSequence"))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        ba, sa = self._axes(node, len(in_shapes[0]))
        if ba == sa:
            raise ValueError(
                "ReverseSequence: batch_axis == seq_axis")
        if in_shapes[1][0] != in_shapes[0][ba]:
            raise ValueError(
                f"ReverseSequence: seq_lengths size {in_shapes[1][0]} != "
                f"batch extent {in_shapes[0][ba]}")
        return ShapeResult({node.out_port: in_shapes[0]})

    @staticmethod
    def _index(xp, shape, lens, ba, sa):
        """Gather index along seq_axis: t < len → len-1-t, else t."""
        t = xp.arange(shape[sa])
        view_t = [1] * len(shape)
        view_t[sa] = shape[sa]
        view_l = [1] * len(shape)
        view_l[ba] = shape[ba]
        tt = t.reshape(view_t)
        ll = xp.asarray(lens).reshape(view_l)
        return xp.where(tt < ll, ll - 1 - tt, tt)

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x = inputs[0]
        ba, sa = self._axes(node, x.ndim)
        idx = self._index(np, x.shape, np.asarray(inputs[1], np.int64),
                          ba, sa)
        idx = np.broadcast_to(idx, x.shape)
        return {node.out_port: np.take_along_axis(x, idx, axis=sa)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        ba, sa = self._axes(node, x.ndim)
        idx = self._index(jnp, x.shape,
                          inputs[1].nchw().astype(jnp.int32), ba, sa)
        idx = jnp.broadcast_to(idx, x.shape)
        return {node.out_port: TValue(
            jnp.take_along_axis(x, idx, axis=sa), "L")}


@register
class BatchNormInference(Op):
    """opset5 BatchNormInference: (x - mean)/sqrt(var + eps) · gamma +
    beta per channel (axis 1).  Input order: x, gamma, beta, mean, var.
    (MO usually folds BN into Multiply/Add — passes/fold_scale.py — but
    IRs that keep the explicit op run it directly.)"""

    type_name = "BatchNormInference"

    @staticmethod
    def _eps(node) -> float:
        from pyopenvino_tpu.ir import attrs as A

        return A.get_float(node.attrs, "epsilon", 1e-5)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        c = in_shapes[0][1]
        for i in range(1, 5):
            if int(np.prod(in_shapes[i])) != c:
                raise ValueError(
                    f"BatchNormInference {node.name}: input {i} has "
                    f"{in_shapes[i]} elements for C={c}")
        return ShapeResult({node.out_port: in_shapes[0]})

    @staticmethod
    def _bn(xp, x, g, b, mean, var, eps):
        view = (1, -1) + (1,) * (x.ndim - 2)
        s = (g / xp.sqrt(var + eps)).reshape(view)
        sh = (b - mean * (g / xp.sqrt(var + eps))).reshape(view)
        return x * s + sh

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x = inputs[0]
        args = [np.asarray(inputs[i], np.float64).reshape(-1)
                for i in range(1, 5)]
        out = self._bn(np, x.astype(np.float64), *args, self._eps(node))
        return {node.out_port: out.astype(x.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        x = inputs[0].nchw()
        args = [inputs[i].nchw().astype(jnp.float32).reshape(-1)
                for i in range(1, 5)]
        out = self._bn(jnp, x.astype(jnp.float32), *args, self._eps(node))
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


@register
class GroupNormalization(Op):
    """opset12 GroupNormalization: per-(sample, group) mean/var
    normalization, then per-channel scale/bias (inputs 1, 2)."""

    type_name = "GroupNormalization"

    @staticmethod
    def _p(node):
        from pyopenvino_tpu.ir import attrs as A

        return (A.get_int(node.attrs, "num_groups"),
                A.get_float(node.attrs, "epsilon", 1e-5))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        g, _ = self._p(node)
        if in_shapes[0][1] % g:
            raise ValueError(
                f"GroupNormalization {node.name}: C={in_shapes[0][1]} "
                f"not divisible by num_groups {g}")
        return ShapeResult({node.out_port: in_shapes[0]})

    @staticmethod
    def _gn(xp, x, scale, bias, g, eps):
        n, c = x.shape[:2]
        rest = x.shape[2:]
        xg = x.reshape((n, g, c // g) + rest)
        axes = tuple(range(2, xg.ndim))
        mean = xg.mean(axis=axes, keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=axes, keepdims=True)
        y = ((xg - mean) / xp.sqrt(var + eps)).reshape(x.shape)
        view = (1, c) + (1,) * len(rest)
        return y * scale.reshape(view) + bias.reshape(view)

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        g, eps = self._p(node)
        out = self._gn(np, inputs[0].astype(np.float64),
                       np.asarray(inputs[1], np.float64).reshape(-1),
                       np.asarray(inputs[2], np.float64).reshape(-1),
                       g, eps)
        return {node.out_port: out.astype(inputs[0].dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        g, eps = self._p(node)
        x = inputs[0].nchw()
        out = self._gn(jnp, x.astype(jnp.float32),
                       inputs[1].nchw().astype(jnp.float32).reshape(-1),
                       inputs[2].nchw().astype(jnp.float32).reshape(-1),
                       g, eps)
        return {node.out_port: TValue(out.astype(x.dtype), "L")}


@register
class OneHot(Op):
    """opset1 OneHot: indices → one-hot along `axis`; depth (input 1)
    must be static; on/off values are inputs 2 and 3."""

    type_name = "OneHot"

    @staticmethod
    def _axis(node):
        from pyopenvino_tpu.ir import attrs as A

        return A.get_int(node.attrs, "axis", -1)

    @staticmethod
    def _depth(vals, node):
        d = vals.get(1)
        if d is None:
            raise ValueError(f"OneHot {node.name}: depth must be constant")
        return int(np.asarray(d).reshape(()))

    def _out_shape(self, in_shape, depth, axis):
        rank = len(in_shape) + 1
        axis = axis % rank
        return tuple(in_shape[:axis]) + (depth,) + tuple(in_shape[axis:])

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        depth = self._depth(in_values, node)
        return ShapeResult({node.out_port: self._out_shape(
            in_shapes[0], depth, self._axis(node))})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        depth = self._depth(inputs, node)
        axis = self._axis(node) % (inputs[0].ndim + 1)
        on = np.asarray(inputs[2]).reshape(())
        off = np.asarray(inputs[3]).reshape(())
        idx = np.asarray(inputs[0], np.int64)
        eye = np.moveaxis(
            (idx[..., None] == np.arange(depth)), -1, axis)
        return {node.out_port: np.where(eye, on, off).astype(on.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        depth = self._depth(
            {1: ctx.static_value(node, 1)}, node)
        axis = self._axis(node) % (len(inputs[0].shape) + 1)
        on = inputs[2].arr.reshape(())
        off = inputs[3].arr.reshape(())
        idx = inputs[0].nchw().astype(jnp.int32)
        eye = jnp.moveaxis(
            idx[..., None] == jnp.arange(depth), -1, axis)
        return {node.out_port: TValue(jnp.where(eye, on, off), "L")}


@register
class ScatterElementsUpdate(Op):
    """opset3 ScatterElementsUpdate: put_along_axis over a constant
    axis (input 3)."""

    type_name = "ScatterElementsUpdate"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        if tuple(in_shapes[1]) != tuple(in_shapes[2]):
            raise ValueError(
                f"ScatterElementsUpdate: indices {tuple(in_shapes[1])} "
                f"!= updates {tuple(in_shapes[2])}")
        ax = in_values.get(3)
        if ax is None:
            raise ValueError(
                "ScatterElementsUpdate: axis must be constant")
        _norm_axis(ax, len(in_shapes[0]), "ScatterElementsUpdate")
        return ShapeResult({node.out_port: in_shapes[0]})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        ax = _norm_axis(inputs[3], inputs[0].ndim, "ScatterElementsUpdate")
        data = np.array(inputs[0])
        np.put_along_axis(
            data, np.asarray(inputs[1], np.int64), inputs[2], axis=ax)
        return {node.out_port: data}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        data = inputs[0].nchw()
        ax = _norm_axis(ctx.static_value(node, 3), data.ndim,
                        "ScatterElementsUpdate")
        idx = inputs[1].nchw().astype(jnp.int32)
        upd = inputs[2].nchw().astype(data.dtype)
        # build full coordinate tuple: arange everywhere, idx on `ax`
        coords = list(jnp.meshgrid(
            *[jnp.arange(s) for s in idx.shape], indexing="ij"))
        coords[ax] = idx
        return {node.out_port: TValue(
            data.at[tuple(coords)].set(upd), "L")}


@register
class ReduceLogicalAnd(_Reduce):
    type_name = "ReduceLogicalAnd"
    np_fn = staticmethod(np.all)
    jnp_name = "all"


@register
class ReduceLogicalOr(_Reduce):
    type_name = "ReduceLogicalOr"
    np_fn = staticmethod(np.any)
    jnp_name = "any"


@register
class CTCGreedyDecoder(Op):
    """opset1 CTCGreedyDecoder: per-timestep argmax, merge repeats, drop
    blanks (class C-1), emit (N, T, 1, 1) class ids padded with -1 — the
    speech-pipeline decoder downstream of the LSTM families.

    Inputs: probs (T, N, C), sequence mask (T, N) of 1/0.
    ``ctc_merge_repeated`` defaults true.  Fixed-shape by construction:
    the dynamic-length decode is a keep-mask + stable-argsort compaction
    (the same padding idiom as DetectionOutput/NMS)."""

    type_name = "CTCGreedyDecoder"

    @staticmethod
    def _merge(node) -> bool:
        from pyopenvino_tpu.ir import attrs as A

        return A.get_bool(node.attrs, "ctc_merge_repeated", True)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        t, n, _c = in_shapes[0]
        return ShapeResult({node.out_port: (n, t, 1, 1)})

    @staticmethod
    def _decode(xp, probs, mask, merge):
        t, n, c = probs.shape
        cls = xp.argmax(probs, axis=2)            # (T, N)
        in_seq = mask > 0.5
        prev = xp.concatenate(
            [xp.full((1, n), -1, cls.dtype), cls[:-1]], axis=0)
        keep = in_seq & (cls != (c - 1))
        if merge:
            keep = keep & (cls != prev)
        # compact kept timesteps to the front per sequence
        tkey = xp.arange(t)[:, None]
        key = xp.where(keep, tkey, t + 1)
        order = xp.argsort(key, axis=0, stable=True)
        cls_sorted = xp.take_along_axis(cls, order, axis=0)
        nkeep = keep.sum(axis=0)                  # (N,)
        rank = xp.arange(t)[:, None]
        out = xp.where(rank < nkeep[None, :], cls_sorted, -1)
        return out.T.reshape(n, t, 1, 1)          # (N, T, 1, 1)

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = self._decode(np, np.asarray(inputs[0], np.float64),
                           np.asarray(inputs[1]), self._merge(node))
        return {node.out_port: out.astype(np.float32)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        out = self._decode(
            jnp, inputs[0].nchw().astype(jnp.float32),
            inputs[1].nchw(), self._merge(node))
        return {node.out_port: TValue(out.astype(jnp.float32), "L")}


@register
class EmbeddingBagOffsetsSum(Op):
    """opset3 EmbeddingBagOffsetsSum: per-bag sums of embedding rows —
    inputs (table (V, E), indices (I,), offsets (N,)[, default_index,
    per_sample_weights (I,)]).  Bag b sums rows indices[offsets[b] :
    offsets[b+1]]; an empty bag reads default_index (or zeros).  The
    segment mapping is computed with searchsorted, so the whole op is a
    weighted segment-sum — static output (N, E)."""

    type_name = "EmbeddingBagOffsetsSum"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n = in_shapes[2][0]
        e = in_shapes[0][1]
        return ShapeResult({node.out_port: (n, e)})

    @staticmethod
    def _compute(xp, table, indices, offsets, default_idx, weights):
        n = offsets.shape[0]
        i = indices.shape[0]
        # segment id of each index position: bag b covers
        # [offsets[b], offsets[b+1])
        pos = xp.arange(i)
        seg = xp.searchsorted(offsets, pos, side="right") - 1
        rows = xp.take(table, indices, axis=0)
        if weights is not None:
            rows = rows * weights[:, None]
        onehot = (seg[:, None] == xp.arange(n)[None, :])
        out = xp.einsum("ie,ib->be", rows, onehot.astype(rows.dtype))
        empty = (xp.concatenate([offsets[1:], xp.asarray([i])])
                 == offsets)
        if default_idx is not None:
            fill = xp.take(table, default_idx.reshape(()), axis=0)
            out = xp.where(empty[:, None], fill[None, :], out)
        else:
            out = xp.where(empty[:, None], 0.0, out)
        return out

    def _args(self, inputs, np_mode):
        table, indices, offsets = inputs[0], inputs[1], inputs[2]
        default_idx = inputs.get(3)
        weights = inputs.get(4)
        return table, indices, offsets, default_idx, weights

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        table, idx, off, d, w = self._args(inputs, True)
        out = self._compute(
            np, np.asarray(table, np.float64),
            np.asarray(idx, np.int64), np.asarray(off, np.int64),
            None if d is None else np.asarray(d, np.int64),
            None if w is None else np.asarray(w, np.float64))
        return {node.out_port: out.astype(np.asarray(table).dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        tvs = {p: tv.nchw() for p, tv in inputs.items()}
        table, idx, off, d, w = self._args(tvs, False)
        # the segment-sum einsum is a matmul: full f32 on the MXU, or the
        # bf16 contraction diverges from the numpy twin (the einsum rule)
        with jax.default_matmul_precision("highest"):
            out = self._compute(
                jnp, table.astype(jnp.float32), idx.astype(jnp.int32),
                off.astype(jnp.int32),
                None if d is None else d.astype(jnp.int32),
                None if w is None else w.astype(jnp.float32))
        return {node.out_port: TValue(out.astype(table.dtype), "L")}
