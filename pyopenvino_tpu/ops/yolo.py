"""RegionYolo — the YOLO-v2/v3 region-head activation (opset1).

No analogue in the reference (pyopenvino/op_plugins/ has no YOLO op; a
YOLO IR dies at inference_engine.py:270-272), but it is the head of one
of the most-deployed OpenVINO demo classes (every OMZ yolo-v2/v3
pipeline), so the engine supports it as a first-class op plus a
programmatic yolo-tiny family (tools/gen_yolo.py) and the host-side
box decode (pyopenvino_tpu/metrics.py decode_region_yolo).

Semantics (matching the OpenVINO CPU plugin):
  input (N, C, H, W) with C = na·(coords + 1 + classes), where
  na = ``num`` when do_softmax else len(``mask``); per anchor block:
    * logistic on x, y (channels 0, 1) and objectness (channel
      ``coords``);
    * class channels: softmax when ``do_softmax`` (YOLO v2) else
      logistic (YOLO v3);
    * w, h (channels 2..coords-1) pass through raw.
  With ``do_softmax`` the output flattens dims [axis, end_axis]
  (YOLO v2's (N, C·H·W) region blob); otherwise the NCHW shape is kept.

``anchors`` is carried as an attribute for the decoder; the activation
itself does not read it.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.extended import _norm_axis
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _params(node):
    a = node.attrs
    return dict(
        coords=A.get_int(a, "coords", 4),
        classes=A.get_int(a, "classes", 80),
        num=A.get_int(a, "num", 5),
        do_softmax=A.get_bool(a, "do_softmax", True),
        mask=A.get_int_tuple(a, "mask", ()),
        axis=A.get_int(a, "axis", 1),
        end_axis=A.get_int(a, "end_axis", 3),
    )


def _flatten_shape(shape, p):
    """Output shape after the do_softmax [axis, end_axis] flatten."""
    axis = _norm_axis(p["axis"], len(shape), "RegionYolo")
    end = _norm_axis(p["end_axis"], len(shape), "RegionYolo")
    return (
        tuple(shape[:axis])
        + (int(np.prod(shape[axis : end + 1])),)
        + tuple(shape[end + 1 :])
    )


def _n_anchors(p) -> int:
    if p["do_softmax"] or not p["mask"]:
        return p["num"]
    return len(p["mask"])


def _check_channels(c, p, name):
    na = _n_anchors(p)
    block = p["coords"] + 1 + p["classes"]
    if c != na * block:
        raise ValueError(
            f"RegionYolo {name}: C={c} != anchors {na} × "
            f"(coords {p['coords']} + 1 + classes {p['classes']})"
        )
    return na, block


def region_yolo_ref(x: np.ndarray, p) -> np.ndarray:
    """Numpy reference activation (reshape/flatten applied)."""
    n, c, h, w = x.shape
    na, block = _check_channels(c, p, "")
    xb = x.reshape(n, na, block, h, w).astype(np.float64)
    out = xb.copy()
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731
    out[:, :, 0] = sig(xb[:, :, 0])
    out[:, :, 1] = sig(xb[:, :, 1])
    out[:, :, p["coords"]] = sig(xb[:, :, p["coords"]])
    cls = xb[:, :, p["coords"] + 1 :]
    if p["do_softmax"]:
        m = cls.max(axis=2, keepdims=True)
        e = np.exp(cls - m)
        out[:, :, p["coords"] + 1 :] = e / e.sum(axis=2, keepdims=True)
    else:
        out[:, :, p["coords"] + 1 :] = sig(cls)
    out = out.reshape(n, c, h, w).astype(x.dtype)
    if p["do_softmax"]:
        out = out.reshape(_flatten_shape(out.shape, p))
    return out


def _reorg_math(xp, x, s: int):
    """The darknet reorg-as-shipped-in-yolov2 mapping (what the OpenVINO
    kernel implements): with input (N, C, H, W), the SOURCE is the input
    buffer reinterpreted as (N, C/s², H·s, W·s) and
    ``out[n, c, h, w] = src[n, c % oc, h·s + (c//oc)//s, w·s + (c//oc)%s]``
    over the INPUT dims, then the result buffer is reinterpreted flat as
    (N, C·s², H/s, W/s).  Darknet runs the layer 'backward'
    (forward=0 in reorg_cpu), which is why this is NOT SpaceToDepth.

    Vectorized: reinterpret → (n, c2, h, dy, w, dx) → transpose to
    (n, dy, dx, c2, h, w) → flat reinterpret to the output dims."""
    n, c, h, w = x.shape
    oc = c // (s * s)
    v = x.reshape(n, oc, h * s, w * s)
    v = v.reshape(n, oc, h, s, w, s)
    t = xp.transpose(v, (0, 3, 5, 1, 2, 4))
    return t.reshape(n, c * s * s, h // s, w // s)


@register
class ReorgYolo(Op):
    """opset2 ReorgYolo — the YOLO-v2 passthrough/skip reorg:
    (N, C, H, W) → (N, C·s², H/s, W/s) with darknet's (backward-run)
    channel interleave (see _reorg_math; a plain SpaceToDepth produces a
    DIFFERENT channel order and silently wrong fused features)."""

    type_name = "ReorgYolo"

    @staticmethod
    def _stride(node) -> int:
        s = A.get_int(node.attrs, "stride", 2)
        if s < 1:
            raise ValueError(f"ReorgYolo: bad stride {s}")
        return s

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        n, c, h, w = in_shapes[0]
        s = self._stride(node)
        if c % (s * s) or h % s or w % s:
            raise ValueError(
                f"ReorgYolo {node.name}: shape {(n, c, h, w)} not "
                f"divisible by stride {s} (C by s², H/W by s)")
        return ShapeResult({node.out_port: (n, c * s * s, h // s, w // s)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        s = self._stride(node)
        x = inputs[0]
        # the kernel's per-channel index math, literally (the spec);
        # emit vectorizes it (_reorg_math) and differential tests pin
        # the two together
        n, c, h, w = x.shape
        oc = c // (s * s)
        src = x.reshape(n, oc, h * s, w * s)
        out = np.empty_like(x)
        for cc in range(c):
            off, c2 = cc // oc, cc % oc
            out[:, cc] = src[:, c2, off // s::s, off % s::s]
        return {node.out_port: out.reshape(n, c * s * s, h // s, w // s)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        s = self._stride(node)
        return {node.out_port: TValue(
            _reorg_math(jnp, inputs[0].nchw(), s), "L")}


@register
class RegionYolo(Op):
    type_name = "RegionYolo"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        p = _params(node)
        shape = in_shapes[0]
        _check_channels(shape[1], p, node.name)
        if p["do_softmax"]:
            shape = _flatten_shape(shape, p)
        return ShapeResult({node.out_port: tuple(shape)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {node.out_port: region_yolo_ref(inputs[0], _params(node))}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        p = _params(node)
        x = inputs[0].nchw()
        n, c, h, w = x.shape
        na, block = _check_channels(c, p, node.name)
        xb = x.reshape(n, na, block, h, w)
        xy = jax.nn.sigmoid(xb[:, :, :2])
        wh = xb[:, :, 2 : p["coords"]]
        obj = jax.nn.sigmoid(xb[:, :, p["coords"] : p["coords"] + 1])
        cls = xb[:, :, p["coords"] + 1 :]
        cls = (
            jax.nn.softmax(cls, axis=2)
            if p["do_softmax"] else jax.nn.sigmoid(cls)
        )
        out = jnp.concatenate([xy, wh, obj, cls], axis=2).reshape(n, c, h, w)
        if p["do_softmax"]:
            out = out.reshape(_flatten_shape(out.shape, p))
        return {node.out_port: TValue(out, "L")}
