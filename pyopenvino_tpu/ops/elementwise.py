"""Element-wise / activation / normalization ops.

Reference semantics: op_plugins/{Add,Multiply,ReLU,Clamp,Sigmoid,SoftMax,LRN}.py.
Quirks fixed per SURVEY.md §7: Multiply's for/else dispatch bug
(Multiply.py:51-58) is moot here (one implementation per backend); SoftMax
honours its declared `axis` attribute (the reference normalizes over the whole
tensor, SoftMax.py:10-25) and subtracts the running max for stability; LRN is
across-channels with the reference's window [c - size//2, c + size//2]
clamped to the channel range (LRN.py:19), and its second input (axes) is
accepted and ignored exactly like the reference (LRN.py:67).

Binary broadcast ops stay channels-last when either operand is: the
(1, C, 1, 1) bias/BN constants are transposed to (1, 1, 1, C) at trace time,
which XLA folds into the weight constant.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _broadcast_shape(a, b):
    return tuple(np.broadcast_shapes(a, b))


class _Binary(Op):
    np_fn = None

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        out = _broadcast_shape(in_shapes[0], in_shapes[1])
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None and in_values.get(1) is not None:
            res.values[node.out_port] = self.np_fn(in_values[0], in_values[1])
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: self.np_fn(inputs[0], inputs[1])}

    @staticmethod
    def _nhwc_operand(tv):
        """Physical NHWC view of an operand whose logical broadcast
        semantics are NCHW numpy-style (right-aligned).  A rank<4 operand
        is first right-aligned into NCHW, then permuted — using it raw
        would pair the wrong axes against an NHWC tensor (e.g. a (C,1,1)
        per-channel const)."""
        if tv.layout == "CL":
            return tv.arr
        arr = tv.arr
        if arr.ndim < 4:
            arr = arr.reshape((1,) * (4 - arr.ndim) + tuple(arr.shape))
        return arr.transpose(0, 2, 3, 1)

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        a, b = inputs[0], inputs[1]
        # Keep 4-D math channels-last if either side already is.
        if (a.layout == "CL" or b.layout == "CL") and max(
            len(a.shape), len(b.shape)
        ) == 4:
            pa = self._nhwc_operand(a)
            pb = self._nhwc_operand(b)
            return {node.out_port: TValue(self.np_fn(pa, pb), "CL")}
        return {node.out_port: TValue(self.np_fn(a.nchw(), b.nchw()), "L")}


@register
class Add(_Binary):
    type_name = "Add"
    np_fn = staticmethod(lambda a, b: a + b)


@register
class Multiply(_Binary):
    type_name = "Multiply"
    np_fn = staticmethod(lambda a, b: a * b)


class _Unary(Op):
    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: in_shapes[0]})

    def _apply_np(self, node, x):
        raise NotImplementedError

    def _apply_jx(self, node, x):
        raise NotImplementedError

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: self._apply_np(node, inputs[0])}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        tv = inputs[0]
        return {node.out_port: TValue(self._apply_jx(node, tv.arr), tv.layout)}


@register
class ReLU(_Unary):
    type_name = "ReLU"
    # Exact int8 carry: max(x, 0) commutes with the positive dequant
    # scale, so an int8-stored activation stays int8 at the same scale
    # (INT8-FULL dataflow, runtime/compiler.py _find_int8_edges).
    int8_ports = (0,)

    def _apply_np(self, node, x):
        return np.maximum(x, 0)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        return jnp.maximum(x, 0)

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        # unlike _Unary.emit, the carried act_scale survives (exact carry)
        tv = inputs[0]
        out = self._apply_jx(node, tv.arr)
        return {
            node.out_port: TValue(out, tv.layout, act_scale=tv.act_scale)
        }


@register
class Clamp(_Unary):
    type_name = "Clamp"

    def _apply_np(self, node, x):
        lo = A.get_float(node.attrs, "min")
        hi = A.get_float(node.attrs, "max")
        return np.clip(x, lo, hi)

    def _apply_jx(self, node, x):
        import jax.numpy as jnp

        lo = A.get_float(node.attrs, "min")
        hi = A.get_float(node.attrs, "max")
        return jnp.clip(x, lo, hi)


@register
class Sigmoid(_Unary):
    type_name = "Sigmoid"

    def _apply_np(self, node, x):
        return (1.0 / (1.0 + np.exp(-x.astype(np.float64)))).astype(x.dtype)

    def _apply_jx(self, node, x):
        import jax

        return jax.nn.sigmoid(x)


@register
class SoftMax(_Unary):
    type_name = "SoftMax"

    def _apply_np(self, node, x):
        axis = A.get_int(node.attrs, "axis", 1)
        m = x.max(axis=axis, keepdims=True)
        e = np.exp(x - m)
        return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax

        axis = A.get_int(node.attrs, "axis", 1)
        x = inputs[0].nchw()  # axis is declared in logical coordinates
        if (
            getattr(ctx, "use_pallas", False)
            and x.ndim == 2
            and axis in (1, -1)
        ):
            from pyopenvino_tpu.kernels.softmax import softmax_rows

            out = softmax_rows(x, interpret=ctx.pallas_interpret)
            return {node.out_port: TValue(out, "L")}
        return {node.out_port: TValue(jax.nn.softmax(x, axis=axis), "L")}


def _lrn_banded(
    x, *, alpha, beta, bias, half, in_scale, out_scale, compute_dtype
):
    """LRN with the channel window-sum as a banded C×C matmul.

    The window over channels is a linear map: Σ_{|k|<=half} x²[c+k]
    = x² · B with B[i, j] = 1 iff |i−j| <= half (clipped at the edges —
    exactly the reference's window, op_plugins/LRN.py).  On the TPU that
    puts the only non-elementwise step on the MXU (~0.6 ms of matmul at
    GoogLeNet batch-512 sizes) and leaves everything else as XLA-fused
    elementwise work at full HBM bandwidth — no lane-shift relayouts.
    x^(-beta) uses rsqrt for beta=0.75 (d^-¾ = rsqrt(d)·√rsqrt(d)).

    in_scale: dequant scale when x is int8 storage; out_scale: requantize
    the result to int8 at this scale (INT8-FULL dataflow).
    """
    import jax.numpy as jnp
    from jax import lax

    c = x.shape[-1]
    band = np.zeros((c, c), np.float32)
    for i in range(c):
        band[max(0, i - half): i + half + 1, i] = 1.0

    if in_scale is not None:
        # int8 codes and the 0/1 band are exact in bf16; the SQUARES are
        # not (codes >64 square past bf16's 8-bit mantissa — ≤2^-9
        # relative), but α·Σ is a small correction to `bias`, so the
        # denominator error stays ≪ the int8 output quantization step
        # (CI gates the int8-in/int8-out path at ±1 code vs the f64
        # reference).  The MXU accumulates in f32; alpha·s² re-scales
        # the code-domain sum.
        xb = x.astype(jnp.bfloat16)
        sq = xb * xb
        win = lax.dot_general(
            sq, jnp.asarray(band, jnp.bfloat16),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = bias + (alpha * in_scale * in_scale) * win
        xf = x.astype(jnp.float32) * in_scale
    else:
        xf = x.astype(jnp.float32)
        sq = x * x  # compute dtype (bf16 rounding matches the conv path)
        win = lax.dot_general(
            sq, jnp.asarray(band, x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(lax.Precision.HIGHEST
                       if x.dtype == jnp.float32 else lax.Precision.DEFAULT),
        )
        d = bias + alpha * win
    if abs(beta - 0.75) < 1e-12:
        r = lax.rsqrt(d)
        out = xf * (r * jnp.sqrt(r))
    else:
        out = xf * jnp.exp(-beta * jnp.log(d))
    if out_scale is not None:
        from pyopenvino_tpu.ops.spec import TValue

        return TValue.quantize(out, out_scale)
    return out.astype(compute_dtype)


@register
class LRN(Op):
    type_name = "LRN"
    # accepter: dequantizes int8-stored input in-register (Pallas kernel
    # on-chip; inline dequant on the XLA/CPU lowering)
    int8_ports = (0,)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: in_shapes[0]})

    def _params(self, node):
        return (
            A.get_float(node.attrs, "alpha"),
            A.get_float(node.attrs, "beta"),
            A.get_float(node.attrs, "bias"),
            A.get_int(node.attrs, "size"),
        )

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x = inputs[0]
        alpha, beta, bias, size = self._params(node)
        c = x.shape[1]
        sq = x.astype(np.float64) ** 2
        denom = np.empty_like(sq)
        for ch in range(c):
            lo, hi = max(0, ch - size // 2), min(c, ch + size // 2 + 1)
            denom[:, ch] = (bias + alpha * sq[:, lo:hi].sum(axis=1)) ** beta
        return {node.out_port: (x / denom).astype(x.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp
        from jax import lax

        alpha, beta, bias, size = self._params(node)
        tv = inputs[0]
        x = tv.nhwc()  # channel dim last → windowed sum over lanes
        half = size // 2

        # On the chip the channel window-sum runs as a banded C×C matmul
        # on the MXU (_lrn_banded) — measured 2.2× the lane-window
        # reduce_window lowering below (GoogLeNet 56×56×192 int8 LRN at
        # batch 512: 3.3 ms vs 7.5 ms).  The XLA lowering does
        # materialize the bf16 square in HBM (~2.0× the byte floor), but
        # TWO independent Pallas fusions of the full pass measured far
        # WORSE in-model and were deleted: a lane-window shift pass
        # (~5 ms + lane-repack relayout) and a square→banded-MXU-matmul→
        # rsqrt→requant kernel (GoogLeNet 19.3k → 11.2k img/s end to end
        # — the custom call also breaks XLA's fusions around it, e.g. the
        # following MaxPool went 0.5 → 10 ms).  docs/MEASUREMENTS.md.
        # CPU/CI keeps reduce_window (banded semantics are CI-tested
        # against ref_compute directly).
        if not ctx.pallas_interpret:
            out_scale = ctx.out_int8_scale(node)
            out = _lrn_banded(
                x, alpha=alpha, beta=beta, bias=bias, half=half,
                in_scale=tv.act_scale, out_scale=out_scale,
                compute_dtype=ctx.compute_dtype,
            )
            return {node.out_port: TValue(out, "CL", act_scale=out_scale)}

        x = tv.dequant().nhwc()  # int8-stored input: dequant inline
        # normalization in f32 regardless of compute dtype (pow in bf16 both
        # loses precision and trips lax.pow's dtype matching)
        xf = x.astype(jnp.float32)
        window_sum = lax.reduce_window(
            xf * xf,
            0.0,
            lax.add,
            window_dimensions=(1, 1, 1, 2 * half + 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (0, 0), (0, 0), (half, half)),
        )
        out = xf * lax.pow(bias + alpha * window_sum, -beta)
        out = out.astype(ctx.compute_dtype)
        return {node.out_port: TValue(out, "CL")}
