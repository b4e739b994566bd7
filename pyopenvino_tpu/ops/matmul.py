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
        if s_x is not None and tv_b.qscale is not None:
            # Any-rank int8 path: a 2-D weight sees leading activation dims
            # flattened into M (one big MXU GEMM — the same collapse the
            # fused_gemm vmap rule performs); a batched weight stack (e.g.
            # an MoE expert tensor (E, K, N)) runs as an XLA batched
            # int8×int8 matmul with int32 accumulation.  The per-output-
            # channel scale has exactly one non-unit axis (passes/
            # quantize.py _quantize_array), so reshape(-1) is the (N,)
            # dequant vector in every layout.
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
            if (ctx.use_pallas and bq.ndim == 2
                    and (bias is None or bias.ndim <= 1)):
                from pyopenvino_tpu.kernels.gemm import fused_gemm

                lead = aq.shape[:-1]
                a2 = aq.reshape(-1, aq.shape[-1]) if aq.ndim != 2 else aq
                out = fused_gemm(
                    a2, bq, scale=w_scale, bias=bias, act=act,
                    out_dtype=compute_dtype, interpret=ctx.pallas_interpret,
                )
                if aq.ndim != 2:
                    out = out.reshape(*lead, out.shape[-1])
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

        if (ctx.use_pallas and tv_b.arr.ndim == 2
                and (bias is None or bias.ndim <= 1)):
            from pyopenvino_tpu.kernels.gemm import fused_gemm

            if tv_b.qscale is not None:
                b, scale = tv_b.arr, tv_b.qscale.reshape(-1)
            else:
                b, scale = tv_b.arr.astype(a.dtype), None
            if tb:
                b = jnp.swapaxes(b, -1, -2)  # scale is per-output-col either way
            lead = a.shape[:-1]
            a2 = a.reshape(-1, a.shape[-1]) if a.ndim != 2 else a
            out = fused_gemm(
                a2, b, scale=scale, bias=bias, act=act,
                out_dtype=a.dtype, interpret=ctx.pallas_interpret,
            )
            if a.ndim != 2:
                out = out.reshape(*lead, out.shape[-1])
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
