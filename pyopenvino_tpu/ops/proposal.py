"""Proposal (opset4, Caffe/Faster-RCNN semantics) — RPN box proposals.

Completes the two-stage detection op set (Proposal → ROIAlign → heads).
No analogue in the reference.  Fixed-shape contract: the op always emits
``N · post_nms_topn`` rois (zero-padded past the kept count), so the
whole RPN stage — anchor generation, delta decode, clipping, min-size
filtering, greedy NMS — compiles statically; only gather indices are
data-dependent.

Semantics (framework="" — the Caffe original):
  * anchors: len(ratios)·len(scales) boxes on a ``base_size`` window
    (round(sqrt(area/ratio)) width quantization, the classic
    generate_anchors), shifted by ``feat_stride`` per cell;
  * foreground scores are channels [A:2A) of input 0;
  * deltas (dx, dy, dw, dh) scaled by box_coordinate/box_size_scale,
    decoded CENTER_SIZE-style, clipped to the image (clip_before_nms),
    min-size filtered against min_size·im_scale;
  * score-sorted, pre_nms_topn cut, sequential greedy NMS at
    ``nms_thresh``, post_nms_topn kept.
  * outputs: rois (N·post_nms_topn, 5) [batch, x1, y1, x2, y2] and
    probs (N·post_nms_topn,).

``framework="tensorflow"`` switches the kernel's convention knobs the
way the OpenVINO plugin does for TF Object-Detection-API exports:
``coordinates_offset`` 1 → 0 (widths are x2−x1, no endpoint pixel),
anchor ratios unrounded, anchors shifted to a zero center
(−base_size/2), anchor windows clipped to the image BEFORE delta
decoding, and im_info height/width read swapped.  The shared math below
is parameterized on exactly those knobs, so both executors realize both
conventions from one code path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _params(node):
    a = node.attrs
    p = dict(
        base_size=A.get_int(a, "base_size"),
        pre_nms_topn=A.get_int(a, "pre_nms_topn"),
        post_nms_topn=A.get_int(a, "post_nms_topn"),
        nms_thresh=A.get_float(a, "nms_thresh"),
        feat_stride=A.get_int(a, "feat_stride"),
        min_size=A.get_int(a, "min_size"),
        ratio=A.get_float_tuple(a, "ratio"),
        scale=A.get_float_tuple(a, "scale"),
        clip_before_nms=A.get_bool(a, "clip_before_nms", True),
        clip_after_nms=A.get_bool(a, "clip_after_nms", False),
        normalize=A.get_bool(a, "normalize", False),
        box_size_scale=A.get_float(a, "box_size_scale", 1.0),
        box_coordinate_scale=A.get_float(a, "box_coordinate_scale", 1.0),
        framework=A.get_str(a, "framework", ""),
    )
    if p["framework"] not in ("", "caffe", "tensorflow"):
        raise NotImplementedError(
            f"Proposal framework={p['framework']!r} unsupported (caffe "
            "and tensorflow conventions only)")
    tf = p["framework"] == "tensorflow"
    # the plugin's per-framework convention knobs (module docstring)
    p["co"] = 0.0 if tf else 1.0          # coordinates_offset
    p["round_ratios"] = not tf
    p["shift_anchors"] = tf
    p["initial_clip"] = tf
    p["swap_xy"] = tf
    return p


def _anchors(p) -> np.ndarray:
    """(A, 4) corner anchors around the base window (generate_anchors),
    parameterized on the coordinates_offset / rounding / shift knobs."""
    base = float(p["base_size"])
    co = p["co"]
    out = []
    cx = cy = 0.5 * (base - co)
    area = base * base
    for r in p["ratio"]:
        size_r = area / r
        if p["round_ratios"]:
            ws = round(np.sqrt(size_r))
            hs = round(ws * r)
        else:
            ws = np.sqrt(size_r)
            hs = ws * r
        for s in p["scale"]:
            w2, h2 = 0.5 * (ws * s - co), 0.5 * (hs * s - co)
            out.append([cx - w2, cy - h2, cx + w2, cy + h2])
    anchors = np.asarray(out, np.float64)
    if p["shift_anchors"]:
        anchors -= base / 2.0
    return anchors


def _ports(node):
    ports = sorted(node.outputs)
    if len(ports) == 2:
        return ports
    return [node.out_port, node.out_port + 1]


def proposal_ref(probs, deltas, im_info, p) -> tuple:
    """Numpy reference.  probs (N, 2A, H, W), deltas (N, 4A, H, W),
    im_info (3,)|(4,) → (rois (N·post, 5), scores (N·post,))."""
    n, _, h, w = probs.shape
    anchors = _anchors(p)
    na = len(anchors)
    co = p["co"]
    img_h, img_w = float(im_info[0]), float(im_info[1])
    if p["swap_xy"]:
        img_h, img_w = img_w, img_h
    scale_h = float(im_info[2]) if len(im_info) > 2 else 1.0
    scale_w = float(im_info[3]) if len(im_info) > 3 else scale_h
    post = p["post_nms_topn"]

    rois = np.zeros((n * post, 5), np.float32)
    out_scores = np.zeros((n * post,), np.float32)
    for b in range(n):
        sc = probs[b, na:].astype(np.float64).reshape(na, h * w)
        dl = deltas[b].astype(np.float64).reshape(na, 4, h * w)
        xs = np.tile(np.arange(w) * p["feat_stride"], h)
        ys = np.repeat(np.arange(h) * p["feat_stride"], w)
        ax1 = anchors[:, 0, None] + xs
        ay1 = anchors[:, 1, None] + ys
        ax2 = anchors[:, 2, None] + xs
        ay2 = anchors[:, 3, None] + ys
        if p["initial_clip"]:
            ax1 = np.clip(ax1, 0, img_w)
            ay1 = np.clip(ay1, 0, img_h)
            ax2 = np.clip(ax2, 0, img_w)
            ay2 = np.clip(ay2, 0, img_h)
        aw = ax2 - ax1 + co
        ah = ay2 - ay1 + co
        acx = ax1 + 0.5 * (aw - co)
        acy = ay1 + 0.5 * (ah - co)
        dx = dl[:, 0] / p["box_coordinate_scale"]
        dy = dl[:, 1] / p["box_coordinate_scale"]
        dw = dl[:, 2] / p["box_size_scale"]
        dh = dl[:, 3] / p["box_size_scale"]
        cx = dx * aw + acx
        cy = dy * ah + acy
        bw = np.exp(dw) * aw
        bh = np.exp(dh) * ah
        x1 = cx - 0.5 * (bw - co)
        y1 = cy - 0.5 * (bh - co)
        x2 = cx + 0.5 * (bw - co)
        y2 = cy + 0.5 * (bh - co)
        if p["clip_before_nms"]:
            x1 = np.clip(x1, 0, img_w - co)
            y1 = np.clip(y1, 0, img_h - co)
            x2 = np.clip(x2, 0, img_w - co)
            y2 = np.clip(y2, 0, img_h - co)
        keep_sz = (((x2 - x1 + co) >= p["min_size"] * scale_w)
                   & ((y2 - y1 + co) >= p["min_size"] * scale_h))
        s = np.where(keep_sz, sc, -np.inf).reshape(-1)
        boxes = np.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
        order = np.argsort(-s, kind="stable")[: p["pre_nms_topn"]]
        order = order[np.isfinite(s[order])]
        kept = []
        for i in order:
            bi = boxes[i]
            ok = True
            for j in kept:
                bj = boxes[j]
                ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
                ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
                iw_ = max(0.0, ix2 - ix1 + co)
                ih_ = max(0.0, iy2 - iy1 + co)
                inter = iw_ * ih_
                ai = (bi[2] - bi[0] + co) * (bi[3] - bi[1] + co)
                aj = (bj[2] - bj[0] + co) * (bj[3] - bj[1] + co)
                if inter / (ai + aj - inter) > p["nms_thresh"]:
                    ok = False
                    break
            if ok:
                kept.append(int(i))
            if len(kept) >= post:
                break
        for k, i in enumerate(kept):
            bx = boxes[i]
            if p["clip_after_nms"]:
                bx = np.clip(bx, [0, 0, 0, 0],
                             [img_w - co, img_h - co,
                              img_w - co, img_h - co])
            if p["normalize"]:
                bx = bx / [img_w, img_h, img_w, img_h]
            rois[b * post + k] = [b, *bx]
            out_scores[b * post + k] = s[i]
    return rois, out_scores


@register
class Proposal(Op):
    type_name = "Proposal"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        p = _params(node)
        n = in_shapes[0][0]
        p0, p1 = _ports(node)
        return ShapeResult({
            p0: (n * p["post_nms_topn"], 5),
            p1: (n * p["post_nms_topn"],),
        })

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        p = _params(node)
        rois, scores = proposal_ref(
            inputs[0], inputs[1], np.asarray(inputs[2]).reshape(-1), p)
        p0, p1 = _ports(node)
        return {p0: rois, p1: scores}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        p = _params(node)
        probs = inputs[0].nchw().astype(jnp.float32)
        deltas = inputs[1].nchw().astype(jnp.float32)
        im_info = inputs[2].nchw().reshape(-1).astype(jnp.float32)
        n, _, h, w = probs.shape
        anchors = jnp.asarray(_anchors(p), jnp.float32)
        na = anchors.shape[0]
        co = p["co"]
        img_h, img_w = im_info[0], im_info[1]
        if p["swap_xy"]:
            img_h, img_w = img_w, img_h
        scale_h = im_info[2] if im_info.shape[0] > 2 else jnp.float32(1.0)
        scale_w = im_info[3] if im_info.shape[0] > 3 else scale_h
        post = p["post_nms_topn"]
        P = na * h * w
        pre = min(p["pre_nms_topn"], P)

        xs = jnp.tile(jnp.arange(w, dtype=jnp.float32) * p["feat_stride"], h)
        ys = jnp.repeat(
            jnp.arange(h, dtype=jnp.float32) * p["feat_stride"], w)

        def one(prob_b, delta_b):
            sc = prob_b[na:].reshape(na, h * w)
            dl = delta_b.reshape(na, 4, h * w)
            ax1 = anchors[:, 0, None] + xs
            ay1 = anchors[:, 1, None] + ys
            ax2 = anchors[:, 2, None] + xs
            ay2 = anchors[:, 3, None] + ys
            if p["initial_clip"]:
                ax1 = jnp.clip(ax1, 0, img_w)
                ay1 = jnp.clip(ay1, 0, img_h)
                ax2 = jnp.clip(ax2, 0, img_w)
                ay2 = jnp.clip(ay2, 0, img_h)
            aw = ax2 - ax1 + co
            ah = ay2 - ay1 + co
            acx = ax1 + 0.5 * (aw - co)
            acy = ay1 + 0.5 * (ah - co)
            cx = dl[:, 0] / p["box_coordinate_scale"] * aw + acx
            cy = dl[:, 1] / p["box_coordinate_scale"] * ah + acy
            bw = jnp.exp(dl[:, 2] / p["box_size_scale"]) * aw
            bh = jnp.exp(dl[:, 3] / p["box_size_scale"]) * ah
            x1 = cx - 0.5 * (bw - co)
            y1 = cy - 0.5 * (bh - co)
            x2 = cx + 0.5 * (bw - co)
            y2 = cy + 0.5 * (bh - co)
            if p["clip_before_nms"]:
                x1 = jnp.clip(x1, 0, img_w - co)
                y1 = jnp.clip(y1, 0, img_h - co)
                x2 = jnp.clip(x2, 0, img_w - co)
                y2 = jnp.clip(y2, 0, img_h - co)
            valid = (((x2 - x1 + co) >= p["min_size"] * scale_w)
                     & ((y2 - y1 + co) >= p["min_size"] * scale_h))
            s = jnp.where(valid, sc, -jnp.inf).reshape(-1)
            boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)

            order = jnp.argsort(-s, stable=True)[:pre]
            bs = boxes[order]
            ss = s[order]
            area = (bs[:, 2] - bs[:, 0] + co) * (bs[:, 3] - bs[:, 1] + co)
            ix1 = jnp.maximum(bs[:, None, 0], bs[None, :, 0])
            iy1 = jnp.maximum(bs[:, None, 1], bs[None, :, 1])
            ix2 = jnp.minimum(bs[:, None, 2], bs[None, :, 2])
            iy2 = jnp.minimum(bs[:, None, 3], bs[None, :, 3])
            inter = (jnp.clip(ix2 - ix1 + co, 0)
                     * jnp.clip(iy2 - iy1 + co, 0))
            union = area[:, None] + area[None, :] - inter
            iou = jnp.where(union > 0, inter / union, 0.0)

            from pyopenvino_tpu.ops.nms import greedy_nms_sweep

            keep, _cnt = greedy_nms_sweep(
                iou, jnp.isfinite(ss), p["nms_thresh"], post)
            # pad the candidate pool so [:post] selection is well-defined
            # even when pre < post (small feature maps)
            padn = max(post, pre)
            pos = jnp.arange(pre)
            rank_key = jnp.concatenate(
                [jnp.where(keep, pos, padn + 1),
                 jnp.full((padn - pre,), padn + 1, pos.dtype)])
            keep_p = jnp.concatenate(
                [keep, jnp.zeros((padn - pre,), bool)])
            bs_p = jnp.concatenate(
                [bs, jnp.zeros((padn - pre, 4), bs.dtype)])
            ss_p = jnp.concatenate(
                [ss, jnp.zeros((padn - pre,), ss.dtype)])
            sel = jnp.argsort(rank_key, stable=True)[:post]
            ok = keep_p[sel]
            out_boxes = bs_p[sel]
            if p["clip_after_nms"]:
                out_boxes = jnp.clip(
                    out_boxes,
                    jnp.zeros((4,)),
                    jnp.stack([img_w - co, img_h - co, img_w - co,
                               img_h - co]))
            if p["normalize"]:
                out_boxes = out_boxes / jnp.asarray(
                    [img_w, img_h, img_w, img_h])
            out_boxes = jnp.where(ok[:, None], out_boxes, 0.0)
            out_scores = jnp.where(ok, ss_p[sel], 0.0)
            return out_boxes, out_scores, ok

        boxes, scores, ok = jax.vmap(one)(probs, deltas)  # (N, post, ...)
        # padding rows are ALL-zero (batch column included), matching the
        # numpy reference
        bcol = (jnp.repeat(jnp.arange(n, dtype=jnp.float32), post)
                * ok.reshape(-1))[:, None]
        rois = jnp.concatenate(
            [bcol, boxes.reshape(n * post, 4)], axis=1)
        p0, p1 = _ports(node)
        return {
            p0: TValue(rois, "L"),
            p1: TValue(scores.reshape(-1), "L"),
        }
