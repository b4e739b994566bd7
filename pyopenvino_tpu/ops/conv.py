"""Convolution and GroupConvolution.

Reference semantics: op_plugins/Convolution.py (2-D conv, NCHW x OIHW,
auto_pad/rounding handling at :21-49) and op_plugins/GroupConvolution.py
(grouped conv, G-Co-Ci-Kh-Kw weights).  Fixed here relative to the reference:
batch-N support (reference hardcodes batch index 0, Convolution.py:112-113),
dilation in the fast path (reference im2col ignores dilation,
Convolution.py:57-87), and general grouped conv (the reference's channel
indexing is only correct for pure depthwise, GroupConvolution.py:77-78).

TPU path: ``lax.conv_general_dilated`` in NHWC/HWIO — XLA lowers this straight
onto the MXU.  INT8 weight-only quantization dequantizes per-output-channel
scales at trace time (see passes/quantize.py); the Pallas backend fuses the
dequant into the GEMM epilogue instead (kernels/gemm.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.padding import conv_padding
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _im2col(x: np.ndarray, kh, kw, sh, sw, dh, dw, pads, pad_value=0.0):
    """(N, C, H, W) → (N, C, kh, kw, OH, OW) patch tensor (batched, dilated)."""
    (pt, pb), (pl, pr) = pads
    xp = np.pad(
        x, ((0, 0), (0, 0), (pt, pb), (pl, pr)), constant_values=pad_value
    )
    H, W = xp.shape[2:]
    oh = (H - (dh * (kh - 1) + 1)) // sh + 1
    ow = (W - (dw * (kw - 1) + 1)) // sw + 1
    n, c = x.shape[:2]
    cols = np.empty((n, c, kh, kw, oh, ow), dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            i0, j0 = i * dh, j * dw
            cols[:, :, i, j] = xp[
                :, :, i0 : i0 + sh * (oh - 1) + 1 : sh, j0 : j0 + sw * (ow - 1) + 1 : sw
            ]
    return cols


def _conv_attrs(node):
    return (
        A.get_int_tuple(node.attrs, "strides", (1, 1)),
        A.get_int_tuple(node.attrs, "dilations", (1, 1)),
    )


def _depthwise_shifted_mac(x, w, strides, dilations, pads):
    """Depthwise conv as kh·kw shifted multiply-adds, channels-last.

    x: (N, H, W, C); w: (C, 1, 1, kh, kw).  out[n,y,x,c] =
    Σ_{i,j} xpad[n, y·sh+i·dh, x·sw+j·dw, c] · w[c,0,0,i,j] — each (i,j)
    term is a strided slice times a (1,1,1,C) vector, all fused by XLA
    into a single VPU pass with f32 accumulation."""
    import jax.numpy as jnp

    (sh, sw), (dh, dw) = strides, dilations
    (pt, pb), (pl, pr) = pads
    c, _, _, kh, kw = w.shape
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    h, wd_ = x.shape[1:3]
    oh = (h - (dh * (kh - 1) + 1)) // sh + 1
    ow = (wd_ - (dw * (kw - 1) + 1)) // sw + 1
    wvec = jnp.transpose(w.reshape(c, kh, kw), (1, 2, 0))  # (kh, kw, C)
    acc = None
    for i in range(kh):
        for j in range(kw):
            i0, j0 = i * dh, j * dw
            sl = x[:, i0 : i0 + sh * (oh - 1) + 1 : sh,
                   j0 : j0 + sw * (ow - 1) + 1 : sw, :]
            term = sl.astype(jnp.float32) * wvec[i, j].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc


def _s2d_applicable(ci, kh, kw, strides, dilations, in_hw, pads, out_hw):
    """Stride-2 space-to-depth rewrite precondition (see _s2d_conv).

    Targets the thin-input stem convs (Ci=3): with N lanes on the MXU a
    Ci·Kh contraction of 21 wastes most of the systolic array and the
    padded NHWC C=3 input is relayout-heavy (measured: GoogLeNet Conv_4
    is 3.2 ms of 25 ms at batch 512, HBM-bound).  The even-padding of
    input/kernel must not change the declared output size (it can when
    padded-H is odd and Kh even — then fall back).

    Kernel must be ≥5: even-padding a K to ⌈K/2⌉·2 multiplies the MAC
    count by (⌈K/2⌉·2/K)², which is 1.78× for K=3 — measured a 5% LOSS
    on SSD-MobileNet's 3×3/s2 stem (14.0k vs 14.7k img/s b256) — but
    only 1.31× for GoogLeNet's 7×7/s2 stem, where the utilization win
    dominates."""
    if ci > 8 or min(kh, kw) < 5:
        return False
    if strides != (2, 2) or dilations != (1, 1):
        return False
    (pt, pb), (pl, pr) = pads
    hp, wp = in_hw[0] + pt + pb, in_hw[1] + pl + pr
    he, we = hp + hp % 2, wp + wp % 2
    khe, kwe = kh + kh % 2, kw + kw % 2
    return (
        he // 2 - khe // 2 + 1 == out_hw[0]
        and we // 2 - kwe // 2 + 1 == out_hw[1]
    )


def _s2d_conv(x, w, pads):
    """Rewrite a stride-2 conv as stride-1 on 2×2 space-to-depth input.

    x: (N, H, W, C) activations (any dtype — int8 codes included, padding
    value 0 is exact in the symmetric code domain); w: (Co, Ci, Kh, Kw).
    Returns (x', w') with x' = (N, ⌈Hp/2⌉, ⌈Wp/2⌉, 4C) and
    w' = (Co, 4Ci, ⌈Kh/2⌉, ⌈Kw/2⌉) such that
    conv(x', w', stride 1, no pad) == conv(x, w, stride 2, pads):
    out[y,x] = Σ_{ki,kj,c} xp[2y+ki, 2x+kj, c]·w[c,ki,kj] with ki=2a+di
    becomes a contraction over (a, b) of the packed channels (di, dj, c).
    """
    import jax.numpy as jnp

    co, ci, kh, kw = w.shape
    (pt, pb), (pl, pr) = pads
    x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    n, h, wd, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, wd % 2), (0, 0)))
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    x = x.reshape(n, h2, 2, w2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4 * c)
    khe, kwe = kh + kh % 2, kw + kw % 2
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, khe - kh), (0, kwe - kw)))
    wr = wp.reshape(co, ci, khe // 2, 2, kwe // 2, 2)  # o,c,a,di,b,dj
    w2_ = wr.transpose(0, 3, 5, 1, 2, 4).reshape(co, 4 * ci, khe // 2, kwe // 2)
    return x, w2_


def _epilogue(out, bias, act):
    """Inline NHWC bias/activation tail for the XLA path."""
    import jax.numpy as jnp

    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    if act is not None:
        kind, lo, hi = act
        out = jnp.maximum(out, 0) if kind == "relu" else jnp.clip(out, lo, hi)
    return out


@register
class Convolution(Op):
    type_name = "Convolution"
    int8_ports = (0,)  # consumes int8 activations on the MXU integer path

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n, _, h, w = in_shapes[0]
        co, _, kh, kw = in_shapes[1]
        pad = conv_padding(node.attrs, (h, w), (kh, kw))
        return ShapeResult({node.out_port: (n, co, pad.out_h, pad.out_w)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x, wgt = inputs[0], inputs[1]
        (sh, sw), (dh, dw) = _conv_attrs(node)
        co, ci, kh, kw = wgt.shape
        pad = conv_padding(node.attrs, x.shape[2:], (kh, kw))
        cols = _im2col(x, kh, kw, sh, sw, dh, dw, pad.pads)
        out = np.einsum("nchwij,ochw->noij", cols, wgt, optimize=True)
        return {node.out_port: out.astype(x.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        return self.emit_fused(ctx, node, inputs)

    def emit_fused(
        self, ctx, node, inputs, bias=None, act=None
    ) -> Dict[int, TValue]:
        """Conv with optional fused bias/activation epilogue (passes/fuse.py).

        PALLAS backend: patches + fused MXU GEMM, INT8 dequant in the
        epilogue.  XLA backend: conv_general_dilated + inline bias/act
        (XLA fuses the elementwise tail into the conv itself)."""
        import jax.numpy as jnp
        from jax import lax

        x = inputs[0].nhwc()
        (sh, sw), (dh, dw) = _conv_attrs(node)
        tv_w = inputs[1]
        co, ci, kh, kw = tv_w.shape
        pad = conv_padding(node.attrs, inputs[0].shape[2:], (kh, kw))

        # Full-INT8: quantize the activation with its calibrated per-tensor
        # scale and run int8×int8 → int32 on the MXU's double-rate integer
        # path; dequant (s_x · s_w[c]) + bias + act run on the f32 epilogue.
        # Native lax int8 convs are used for EVERY conv shape — the XLA:TPU
        # integer-conv compile hang that forced round 1 onto a Pallas-GEMM-
        # only 1×1 route is fixed in the current stack (re-measured; the
        # shifted-MAC/conv_direct detours are retired; conv_direct.py stays
        # as library code).  int8 activations halve the HBM bytes of every
        # bandwidth-bound layer, which is where SSD/MobileNet lives.
        # Input may already be int8 in HBM (inter-layer storage,
        # runtime/compiler.py _find_int8_edges) — then its storage scale is
        # the activation scale and no on-the-fly quantize is needed.
        s2d = _s2d_applicable(
            ci, kh, kw, (sh, sw), (dh, dw), inputs[0].shape[2:],
            pad.pads, (pad.out_h, pad.out_w),
        )

        stored = inputs[0].act_scale
        s_x = stored if stored is not None else (
            ctx.act_scale(node) if getattr(ctx, 'full_int8', False) else None
        )
        if s_x is not None and tv_w.qscale is not None:
            import jax.numpy as jnp
            from jax import lax

            if stored is not None:
                compute_dtype = ctx.compute_dtype
                xq = x  # already int8
            else:
                compute_dtype = x.dtype
                xq = TValue.quantize(x, s_x)
            w_scale = tv_w.qscale.reshape(-1).astype(jnp.float32) * s_x
            w_int8, pads_, strides_ = tv_w.arr, pad.pads, (sh, sw)
            if s2d:
                xq, w_int8 = _s2d_conv(xq, w_int8, pad.pads)
                pads_, strides_ = ((0, 0), (0, 0)), (1, 1)
            w_hwio = jnp.transpose(w_int8, (2, 3, 1, 0))  # int8 HWIO
            acc = lax.conv_general_dilated(
                xq, w_hwio,
                window_strides=strides_, padding=pads_,
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            out = acc.astype(jnp.float32) * w_scale.reshape(1, 1, 1, -1)
            out = _epilogue(out, bias, act)
            return {node.out_port: TValue(out.astype(compute_dtype), "CL")}
        if stored is not None:  # defensive: dequantize for the float path
            x = x.astype(ctx.compute_dtype) * stored

        # Routing policy for the PALLAS backend: 1×1 convs ARE GEMMs — the
        # patch step is a pure reshape, so the fused Pallas kernel wins on
        # HBM traffic (int8 weights stay int8 until VMEM).  Spatial kernels
        # would materialize a kh·kw× patch tensor in HBM (the im2col cost
        # the reference pays per-layer, Convolution.py:57-87), where XLA's
        # implicit-GEMM conv is strictly better — those stay on
        # conv_general_dilated with the epilogue fused by XLA.
        # Additionally require MXU-friendly channel counts: with N padded to
        # 128 lanes, a co=16 inception branch would waste 7/8 of every tile —
        # XLA's conv handles the narrow layers better.
        if ctx.use_pallas and kh == kw == 1 and co >= 128 and ci >= 64:
            from pyopenvino_tpu.kernels.conv import conv2d_fused

            if tv_w.qscale is not None:
                w, scale = tv_w.arr, tv_w.qscale.reshape(-1)
            else:
                w, scale = tv_w.arr.astype(x.dtype), None
            out = conv2d_fused(
                x, w, scale=scale, bias=bias, act=act,
                strides=(sh, sw), dilations=(dh, dw), pads=pad.pads,
                interpret=ctx.pallas_interpret,
            )
            return {node.out_port: TValue(out, "CL")}

        w = ctx.weight_for(node, tv_w)  # OIHW, possibly dequantized
        pads_, strides_ = pad.pads, (sh, sw)
        if s2d:
            x, w = _s2d_conv(x, w.astype(x.dtype), pad.pads)
            pads_, strides_ = ((0, 0), (0, 0)), (1, 1)
        w_hwio = jnp.transpose(w, (2, 3, 1, 0))
        out = lax.conv_general_dilated(
            x,
            w_hwio.astype(x.dtype),
            window_strides=strides_,
            padding=pads_,
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            # f32 mode means full f32: without HIGHEST the TPU MXU
            # multiplies in bf16 and fp32 no longer matches the
            # interpreter (flips threshold-sensitive detections)
            precision=(lax.Precision.HIGHEST
                       if x.dtype == jnp.float32
                       else lax.Precision.DEFAULT),
        )
        out = _epilogue(out, bias, act)
        return {node.out_port: TValue(out.astype(x.dtype), "CL")}


@register
class GroupConvolution(Op):
    type_name = "GroupConvolution"
    int8_ports = (0,)  # consumes int8 activations on the MXU integer path

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n, _, h, w = in_shapes[0]
        g, co, _, kh, kw = in_shapes[1]
        pad = conv_padding(node.attrs, (h, w), (kh, kw))
        return ShapeResult({node.out_port: (n, g * co, pad.out_h, pad.out_w)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        x, wgt = inputs[0], inputs[1]
        (sh, sw), (dh, dw) = _conv_attrs(node)
        g, co, ci, kh, kw = wgt.shape
        pad = conv_padding(node.attrs, x.shape[2:], (kh, kw))
        cols = _im2col(x, kh, kw, sh, sw, dh, dw, pad.pads)
        n = x.shape[0]
        cols = cols.reshape(n, g, ci, kh, kw, *cols.shape[-2:])
        out = np.einsum("ngchwij,gochw->ngoij", cols, wgt, optimize=True)
        out = out.reshape(n, g * co, *out.shape[-2:])
        return {node.out_port: out.astype(x.dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        return self.emit_fused(ctx, node, inputs)

    def emit_fused(
        self, ctx, node, inputs, bias=None, act=None
    ) -> Dict[int, TValue]:
        """Grouped/depthwise conv + fused bias/act tail.

        Default: native ``feature_group_count`` conv — measured ~5x faster
        than the shifted-MAC form on TPU v5e (1.13 ms vs 5.8 ms for the
        SSD 64ch-150x150-s2 layer at batch 32) now that the grouped-conv
        compile hang of the earlier stack is fixed.  Config.depthwise_mode
        = "shifted_mac" restores the round-1 workaround (kh·kw shifted
        multiply-accumulates on the VPU) for backends where the hang
        recurs.  Full-INT8: int8×int8 grouped conv with the calibrated
        activation scale — depthwise is HBM-bound, so int8 activations
        halve its cost ceiling."""
        import jax.numpy as jnp
        from jax import lax

        x = inputs[0].nhwc()
        (sh, sw), (dh, dw) = _conv_attrs(node)
        tv_w = inputs[1]
        g, co, ci, kh, kw = tv_w.shape
        pad = conv_padding(node.attrs, inputs[0].shape[2:], (kh, kw))

        def grouped_conv(xin, w_hwio, preferred):
            return lax.conv_general_dilated(
                xin, w_hwio,
                window_strides=(sh, sw), padding=pad.pads,
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
                preferred_element_type=preferred,
                precision=(lax.Precision.HIGHEST
                           if xin.dtype == jnp.float32
                           else lax.Precision.DEFAULT),
            )

        stored = inputs[0].act_scale
        s_x = stored if stored is not None else (
            ctx.act_scale(node) if getattr(ctx, 'full_int8', False) else None
        )
        if s_x is not None and tv_w.qscale is not None:
            if stored is not None:
                compute_dtype = ctx.compute_dtype
                xq = x  # already int8 in HBM (compiler inter-layer storage)
            else:
                compute_dtype = x.dtype
                xq = TValue.quantize(x, s_x)
            # (G, Co, Ci, Kh, Kw) int8 → HWIO with O = G*Co
            w_hwio = jnp.transpose(
                tv_w.arr.reshape(g * co, ci, kh, kw), (2, 3, 1, 0)
            )
            acc = grouped_conv(xq, w_hwio, jnp.int32)
            w_scale = tv_w.qscale.reshape(-1).astype(jnp.float32) * s_x
            out = acc.astype(jnp.float32) * w_scale.reshape(1, 1, 1, -1)
            out = _epilogue(out, bias, act)
            return {node.out_port: TValue(out.astype(compute_dtype), "CL")}
        if stored is not None:  # defensive: dequantize for the float path
            x = x.astype(ctx.compute_dtype) * stored

        w = ctx.weight_for(node, tv_w)  # (G, Co, Ci, Kh, Kw)
        mode = getattr(
            getattr(ctx, "config", None), "depthwise_mode", "native"
        )
        if co == 1 and ci == 1 and mode == "shifted_mac":
            out = _depthwise_shifted_mac(
                x, w.astype(x.dtype), (sh, sw), (dh, dw), pad.pads
            )
        else:
            w_hwio = jnp.transpose(w.reshape(g * co, ci, kh, kw), (2, 3, 1, 0))
            out = grouped_conv(x, w_hwio.astype(x.dtype), jnp.float32)
        out = _epilogue(out, bias, act)
        return {node.out_port: TValue(out.astype(x.dtype), "CL")}
