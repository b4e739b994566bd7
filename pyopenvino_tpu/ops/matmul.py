"""MatMul with transpose_a/transpose_b attributes.

Reference semantics: op_plugins/MatMul.py (2-D matmul, string transpose attrs
parsed at :57-58).  On TPU this is a single MXU GEMM; INT8 weight-only consts
are dequantized via ctx.weight_for (fused in the Pallas backend).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _flags(node):
    return (
        A.get_bool(node.attrs, "transpose_a", False),
        A.get_bool(node.attrs, "transpose_b", False),
    )


@register
class MatMul(Op):
    type_name = "MatMul"
    int8_ports = (0,)  # consumes int8 activations on the MXU integer path

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        ta, tb = _flags(node)
        a, b = in_shapes[0], in_shapes[1]
        m = a[-1] if ta else a[-2]
        n = b[-2] if tb else b[-1]
        return ShapeResult({node.out_port: (*a[:-2], m, n)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        ta, tb = _flags(node)
        a, b = inputs[0], inputs[1]
        if ta:
            a = np.swapaxes(a, -1, -2)
        if tb:
            b = np.swapaxes(b, -1, -2)
        return {node.out_port: np.matmul(a, b)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        return self.emit_fused(ctx, node, inputs)

    def emit_fused(
        self, ctx, node, inputs, bias=None, act=None
    ) -> Dict[int, TValue]:
        import jax.numpy as jnp

        ta, tb = _flags(node)
        a = inputs[0].nchw()
        tv_b = inputs[1]
        if ta:
            a = jnp.swapaxes(a, -1, -2)

        # Full-INT8: calibrated activation scale → int8×int8 MXU GEMM with
        # f32 dequant epilogue (same scheme as Convolution.emit_fused).
        # The input may already be int8 in HBM (compiler inter-layer
        # storage) — then its storage scale applies and no quantize runs.
        stored = inputs[0].act_scale
        s_x = stored if stored is not None else (
            ctx.act_scale(node) if getattr(ctx, 'full_int8', False) else None
        )
        if s_x is not None and tv_b.qscale is not None and a.ndim == 2:
            if stored is not None:
                compute_dtype = ctx.compute_dtype
                aq = a
            else:
                compute_dtype = a.dtype
                aq = TValue.quantize(a, s_x)
            bq = tv_b.arr
            if tb:
                bq = jnp.swapaxes(bq, -1, -2)
            w_scale = tv_b.qscale.reshape(-1).astype(jnp.float32) * s_x
            if ctx.use_pallas:
                from pyopenvino_tpu.kernels.gemm import fused_gemm

                out = fused_gemm(
                    aq, bq, scale=w_scale, bias=bias, act=act,
                    out_dtype=compute_dtype, interpret=ctx.pallas_interpret,
                )
                return {node.out_port: TValue(out, "L")}
            acc = jnp.matmul(aq, bq, preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * w_scale
            if bias is not None:
                out = out + bias.astype(out.dtype)
            if act is not None:
                kind, lo, hi = act
                out = (jnp.maximum(out, 0) if kind == "relu"
                       else jnp.clip(out, lo, hi))
            return {node.out_port: TValue(out.astype(compute_dtype), "L")}
        if stored is not None:  # defensive: dequantize for the float path
            a = a.astype(ctx.compute_dtype) * stored

        if ctx.use_pallas and a.ndim == 2:
            from pyopenvino_tpu.kernels.gemm import fused_gemm

            if tv_b.qscale is not None:
                b, scale = tv_b.arr, tv_b.qscale.reshape(-1)
            else:
                b, scale = tv_b.arr.astype(a.dtype), None
            if tb:
                b = jnp.swapaxes(b, -1, -2)  # scale is per-output-col either way
            out = fused_gemm(
                a, b, scale=scale, bias=bias, act=act,
                out_dtype=a.dtype, interpret=ctx.pallas_interpret,
            )
            return {node.out_port: TValue(out, "L")}

        b = ctx.weight_for(node, tv_b)
        if tb:
            b = jnp.swapaxes(b, -1, -2)
        from jax import lax

        out = jnp.matmul(
            a, b.astype(a.dtype), preferred_element_type=jnp.float32,
            precision=(lax.Precision.HIGHEST if a.dtype == jnp.float32
                       else lax.Precision.DEFAULT),
        )
        if bias is not None:
            out = out + bias.astype(out.dtype)
        if act is not None:
            kind, lo, hi = act
            out = jnp.maximum(out, 0) if kind == "relu" else jnp.clip(out, lo, hi)
        return {node.out_port: TValue(out.astype(a.dtype), "L")}
