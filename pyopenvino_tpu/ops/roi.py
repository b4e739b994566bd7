"""ROIAlign (opset3 semantics) — the two-stage-detector pooling op
(Faster/Mask-RCNN exports pair it with proposal post-blocks).

No analogue in the reference (pyopenvino/op_plugins/ has nothing
ROI-shaped).  Fixed-shape by construction: R rois × a static
``pooled_h × pooled_w`` grid with ``sampling_ratio²`` bilinear samples
per bin — the whole op is dense gathers and reductions, which is exactly
what the TPU wants (no data-dependent shapes; the dynamic part is only
WHERE the samples land, i.e. gather indices).

Semantics: roi corners [x1, y1, x2, y2] scaled by ``spatial_scale``
(asymmetric alignment, the opset3 default), each output bin averages
(or maxes) sampling_ratio² bilinear samples placed at the bin's interior
half-offsets.  ``sampling_ratio`` must be ≥1 — the adaptive 0 mode sizes
the grid per roi at run time, which has no static-shape compilation
(same contract as every other shape-consuming attr here).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _params(node):
    a = node.attrs
    p = dict(
        pooled_h=A.get_int(a, "pooled_h"),
        pooled_w=A.get_int(a, "pooled_w"),
        sampling_ratio=A.get_int(a, "sampling_ratio", 1),
        spatial_scale=A.get_float(a, "spatial_scale", 1.0),
        mode=A.get_str(a, "mode", "avg"),
    )
    if p["sampling_ratio"] < 1:
        raise NotImplementedError(
            "ROIAlign sampling_ratio=0 (adaptive per-roi grids) has no "
            "static-shape compilation — set an explicit ratio")
    if p["mode"] not in ("avg", "max"):
        raise ValueError(f"ROIAlign: unknown mode {p['mode']!r}")
    return p


def _sample_points(roi, p):
    """Per-roi sample coordinates: (PH·sr,) ys and (PW·sr,) xs (numpy or
    jax arrays, depending on the roi's type)."""
    x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
    ph, pw, sr = p["pooled_h"], p["pooled_w"], p["sampling_ratio"]
    rh = (y2 - y1) * p["spatial_scale"]
    rw = (x2 - x1) * p["spatial_scale"]
    bin_h, bin_w = rh / ph, rw / pw
    iy = np.arange(ph * sr)
    ix = np.arange(pw * sr)
    ys = y1 * p["spatial_scale"] + (iy // sr) * bin_h + (
        (iy % sr) + 0.5) * (bin_h / sr)
    xs = x1 * p["spatial_scale"] + (ix // sr) * bin_w + (
        (ix % sr) + 0.5) * (bin_w / sr)
    return ys, xs


def _bilinear_np(img, ys, xs):
    """img (C, H, W), ys (A,), xs (B,) → (C, A, B) bilinear samples.
    Caffe2/OpenVINO convention: a sample whose coordinate lies beyond
    [-1, size] contributes ZERO; in-range coordinates clamp to the
    border."""
    c, h, w = img.shape
    valid = ((ys >= -1.0) & (ys <= h))[:, None] & (
        (xs >= -1.0) & (xs <= w))[None, :]
    y = np.clip(ys, 0, h - 1)
    x = np.clip(xs, 0, w - 1)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (y - y0)[None, :, None]
    wx = (x - x0)[None, None, :]
    top = (1 - wx) * img[:, y0][:, :, x0] + wx * img[:, y0][:, :, x1]
    bot = (1 - wx) * img[:, y1][:, :, x0] + wx * img[:, y1][:, :, x1]
    return ((1 - wy) * top + wy * bot) * valid[None]


def roi_align_ref(data, rois, batch_idx, p) -> np.ndarray:
    """(N,C,H,W), (R,4), (R,) → (R, C, pooled_h, pooled_w)."""
    ph, pw, sr = p["pooled_h"], p["pooled_w"], p["sampling_ratio"]
    out = np.empty(
        (len(rois), data.shape[1], ph, pw), dtype=np.float32)
    for r in range(len(rois)):
        ys, xs = _sample_points(rois[r].astype(np.float64), p)
        s = _bilinear_np(
            data[int(batch_idx[r])].astype(np.float64), ys, xs)
        s = s.reshape(data.shape[1], ph, sr, pw, sr)
        out[r] = (s.mean(axis=(2, 4)) if p["mode"] == "avg"
                  else s.max(axis=(2, 4)))
    return out.astype(data.dtype)


@register
class ROIAlign(Op):
    type_name = "ROIAlign"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        p = _params(node)
        r = in_shapes[1][0]
        c = in_shapes[0][1]
        return ShapeResult(
            {node.out_port: (r, c, p["pooled_h"], p["pooled_w"])})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        p = _params(node)
        return {node.out_port: roi_align_ref(
            inputs[0], inputs[1], inputs[2], p)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        p = _params(node)
        data = inputs[0].nchw().astype(jnp.float32)
        rois = inputs[1].nchw().astype(jnp.float32)
        bidx = inputs[2].nchw().astype(jnp.int32)
        c, h, w = data.shape[1:]
        ph, pw, sr = p["pooled_h"], p["pooled_w"], p["sampling_ratio"]

        def one(roi, bi):
            img = jnp.take(data, bi, axis=0)  # (C, H, W)
            ys, xs = _sample_points(roi, p)
            # Caffe2/OpenVINO: samples beyond [-1, size] contribute zero
            valid = ((ys >= -1.0) & (ys <= h))[:, None] & (
                (xs >= -1.0) & (xs <= w))[None, :]
            y = jnp.clip(ys, 0, h - 1)
            x = jnp.clip(xs, 0, w - 1)
            y0 = jnp.floor(y).astype(jnp.int32)
            x0 = jnp.floor(x).astype(jnp.int32)
            y1 = jnp.minimum(y0 + 1, h - 1)
            x1 = jnp.minimum(x0 + 1, w - 1)
            wy = (y - y0)[None, :, None]
            wx = (x - x0)[None, None, :]
            g = lambda yy, xx: img[:, yy][:, :, xx]  # noqa: E731
            top = (1 - wx) * g(y0, x0) + wx * g(y0, x1)
            bot = (1 - wx) * g(y1, x0) + wx * g(y1, x1)
            s = (((1 - wy) * top + wy * bot) * valid[None]).reshape(
                c, ph, sr, pw, sr)
            return (s.mean(axis=(2, 4)) if p["mode"] == "avg"
                    else s.max(axis=(2, 4)))

        out = jax.vmap(one)(rois, bidx)
        return {node.out_port: TValue(
            out.astype(inputs[0].arr.dtype
                       if jnp.issubdtype(inputs[0].arr.dtype, jnp.floating)
                       else jnp.float32), "L")}
