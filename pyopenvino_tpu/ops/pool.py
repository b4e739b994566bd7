"""MaxPool and AvgPool.

Reference semantics: op_plugins/MaxPool.py and op_plugins/AvgPool.py, with the
documented quirks fixed (SURVEY.md §7): MaxPool pads with -inf instead of
initializing the running max to 0 (MaxPool.py:95), AvgPool honours its
declared pads with exclude-pad counting (AvgPool.py:104-107 parses but never
applies pads), and GoogLeNet's rounding_type="ceil" pools get the extended
end-padding from ops/padding.py with out-of-bounds positions masked from the
window (they contribute neither to max nor to the average divisor).

TPU path: ``lax.reduce_window`` in NHWC — XLA maps this onto the VPU.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ops.padding import pool_padding
from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _pool_ref(node, x: np.ndarray, mode: str, exclude_pad: bool) -> np.ndarray:
    kh, kw = A.get_int_tuple(node.attrs, "kernel")
    sh, sw = A.get_int_tuple(node.attrs, "strides", (1, 1))
    pad = pool_padding(node.attrs, x.shape[2:])
    neutral = -np.inf if mode == "max" else 0.0
    xp = np.pad(x, ((0, 0), (0, 0), *pad.pads), constant_values=neutral)
    # validity mask distinguishes real input from padding (for avg divisor)
    valid = np.pad(
        np.ones(x.shape[2:], dtype=np.float32), pad.pads, constant_values=0.0
    )
    n, c = x.shape[:2]
    out = np.empty((n, c, pad.out_h, pad.out_w), dtype=x.dtype)
    for i in range(pad.out_h):
        for j in range(pad.out_w):
            win = xp[:, :, i * sh : i * sh + kh, j * sw : j * sw + kw]
            vwin = valid[i * sh : i * sh + kh, j * sw : j * sw + kw]
            if mode == "max":
                out[:, :, i, j] = win.max(axis=(2, 3))
            else:
                s = win.sum(axis=(2, 3))
                count = vwin.sum() if exclude_pad else float(kh * kw)
                out[:, :, i, j] = s / count
    return out


def _pool_emit(ctx, node, tv: TValue, mode: str, exclude_pad: bool) -> TValue:
    import jax.numpy as jnp
    from jax import lax

    x = tv.nhwc()
    kh, kw = A.get_int_tuple(node.attrs, "kernel")
    sh, sw = A.get_int_tuple(node.attrs, "strides", (1, 1))
    pad = pool_padding(node.attrs, tv.shape[2:])

    # Pooling always lowers through lax.reduce_window: it is VPU-streaming
    # work where XLA's lowering is already optimal.  A hand-written Pallas
    # pool kernel was built, CI-validated in interpret mode, and DELETED in
    # round 2: Mosaic rejects its lane-merging downsample reshape on this
    # backend (re-tested after the stack update that fixed the grouped/int8
    # conv hangs — remote_compile HTTP 500), and a kernel that cannot run
    # on the hardware is shelf-ware, not a kernel library
    # (docs/MEASUREMENTS.md "Pruned kernels").
    window = (1, kh, kw, 1)
    strides = (1, sh, sw, 1)
    padding = ((0, 0), *pad.pads, (0, 0))
    if mode == "max" and tv.act_scale is not None:
        # INT8-FULL exact carry: max commutes with the positive dequant
        # scale, so pooling the int8 codes directly equals pooling the
        # dequantized values.  Computed by widening to f32 in-register
        # (int8 values are exact in f32; the converts fuse into the
        # reduce_window read/write, so HBM stays 1 byte/elem both ways) —
        # a native int8 reduce_window also runs on this chip but costs a
        # ~250 s XLA compile vs ~30 s for this form.
        out = lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, lax.max, window, strides, padding
        ).astype(jnp.int8)
        return TValue(out, "CL", act_scale=tv.act_scale)
    if mode == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
        out = lax.reduce_window(x, init, lax.max, window, strides, padding)
    else:
        s = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
        if exclude_pad:
            ones = jnp.ones((1,) + x.shape[1:3] + (1,), dtype=x.dtype)
            cnt = lax.reduce_window(ones, 0.0, lax.add, window, strides, padding)
            out = s / cnt
        else:
            out = s / float(kh * kw)
    return TValue(out.astype(x.dtype), "CL")


@register
class MaxPool(Op):
    type_name = "MaxPool"
    int8_ports = (0,)  # exact int8 carry (see _pool_emit)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n, c, h, w = in_shapes[0]
        pad = pool_padding(node.attrs, (h, w))
        return ShapeResult({node.out_port: (n, c, pad.out_h, pad.out_w)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: _pool_ref(node, inputs[0], "max", False)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        return {node.out_port: _pool_emit(ctx, node, inputs[0], "max", False)}


@register
class AvgPool(Op):
    type_name = "AvgPool"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n, c, h, w = in_shapes[0]
        pad = pool_padding(node.attrs, (h, w))
        return ShapeResult({node.out_port: (n, c, pad.out_h, pad.out_w)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        excl = A.get_bool(node.attrs, "exclude-pad", True)
        return {node.out_port: _pool_ref(node, inputs[0], "avg", excl)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        excl = A.get_bool(node.attrs, "exclude-pad", True)
        return {node.out_port: _pool_emit(ctx, node, inputs[0], "avg", excl)}
