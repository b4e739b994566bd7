"""NonMaxSuppression (opset9) — the standalone NMS op modern exported
detection IRs carry (YOLOv5/v8, EfficientDet exports pair it with
Gather/StridedSlice post-blocks).

No analogue in the reference (its only suppression lives inside
DetectionOutput, op_plugins/DetectionOutput.py:38-63).  Unlike
DetectionOutput's class-agnostic kill-matrix (exact there for reasons
derived in ops/ssd.py), the opset spec is SEQUENTIAL greedy NMS per
(batch, class): a box suppressed by an already-suppressed box survives —
so this op implements the true greedy order in both executors.

TPU-native shape contract: the opset9 outputs are statically bounded —
``num_selected ≤ N · C · min(num_boxes, max_output_boxes_per_class)`` —
and rows beyond ``valid_outputs`` are padded with -1, so the whole op is
fixed-shape under jit (the dynamic-length result is an illusion the pad
rows absorb).  The JAX path runs one `lax.fori_loop` greedy sweep per
(batch, class) slice, vmapped over both.

Outputs: selected_indices (S, 3) int64 [batch, class, box],
selected_scores (S, 3) f32 [batch, class, score], valid_outputs (1,).
``soft_nms_sigma`` > 0 switches to Soft-NMS with Gaussian weighting
(TF NonMaxSuppressionV5 semantics — the op NMS-5 was introduced to
convert): every selection decays surviving candidates by
``exp(-0.5·iou²/σ)``, reported scores are the decayed ones, and the
sweep becomes an iterative argmax (still fixed-shape under jit).
``sort_result_descending=1`` sorts the valid rows by score across
classes; otherwise rows group by (batch, class) in score order.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _params(node):
    a = node.attrs
    return dict(
        box_encoding=A.get_str(a, "box_encoding", "corner"),
        sort_result_descending=A.get_bool(a, "sort_result_descending", True),
        output_type=A.get_str(a, "output_type", "i64"),
    )


def _corner(boxes, encoding):
    """(…, 4) → corner (y1, x1, y2, x2) with min/max normalized (the spec
    accepts flipped corners)."""
    if encoding == "center":
        cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2],
                        boxes[..., 3])
        return np.stack(
            [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)
    y1 = np.minimum(boxes[..., 0], boxes[..., 2])
    x1 = np.minimum(boxes[..., 1], boxes[..., 3])
    y2 = np.maximum(boxes[..., 0], boxes[..., 2])
    x2 = np.maximum(boxes[..., 1], boxes[..., 3])
    return np.stack([y1, x1, y2, x2], axis=-1)


def _iou_np(b):
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    y1 = np.maximum(b[:, None, 0], b[None, :, 0])
    x1 = np.maximum(b[:, None, 1], b[None, :, 1])
    y2 = np.minimum(b[:, None, 2], b[None, :, 2])
    x2 = np.minimum(b[:, None, 3], b[None, :, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    union = area[:, None] + area[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def _static_inputs(node, in_values, inputs=None):
    """(max_boxes_per_class, iou_thr, score_thr, soft_sigma) — from the
    optional const inputs 2..5 (spec defaults when absent)."""
    def val(i, default):
        v = None
        if inputs is not None and i in inputs:
            v = inputs[i]
        elif in_values is not None:
            v = in_values.get(i)
        if v is None:
            if i in node.inputs:  # connected but not statically known
                raise ValueError(
                    f"NonMaxSuppression {node.name}: input {i} must be "
                    "constant (static shapes under jit)")
            return default
        return float(np.asarray(v).reshape(()))

    max_boxes = int(val(2, 0))
    iou_thr = val(3, 0.0)
    score_thr = val(4, 0.0)
    sigma = val(5, 0.0)
    if sigma < 0.0:
        raise ValueError(
            "NonMaxSuppression: soft_nms_sigma must be non-negative")
    return max_boxes, iou_thr, score_thr, sigma


def _sel_bound(node, in_shapes, in_values):
    n, num_boxes, _ = in_shapes[0]
    _, classes, _ = in_shapes[1]
    max_boxes, _, _, _ = _static_inputs(node, in_values)
    per_class = num_boxes if max_boxes <= 0 else min(max_boxes, num_boxes)
    return int(n * classes * per_class)


def _ports(node):
    ports = sorted(node.outputs)
    if len(ports) == 3:
        return ports
    return [node.out_port + i for i in range(3)]


def greedy_nms_sweep(iou_sorted, valid_sorted, iou_thr, max_keep):
    """The sequential greedy-NMS kernel shared by NonMaxSuppression and
    Proposal: candidates ALREADY sorted by descending score; a candidate
    is kept iff it is valid, the keep budget is not exhausted, and no
    KEPT earlier (higher-score) candidate overlaps it beyond iou_thr.
    Returns (keep mask over sorted candidates, kept count)."""
    import jax
    import jax.numpy as jnp

    n = iou_sorted.shape[0]
    pos = jnp.arange(n)

    def body(i, carry):
        keep, cnt = carry
        sup = ((iou_sorted[i] > iou_thr) & keep & (pos < i)).any()
        ok = valid_sorted[i] & (cnt < max_keep) & ~sup
        keep = keep.at[i].set(ok)
        return keep, cnt + ok.astype(jnp.int32)

    return jax.lax.fori_loop(
        0, n, body, (jnp.zeros(n, bool), jnp.int32(0)))


def nms_greedy_np(boxes, scores, max_boxes, iou_thr, score_thr, p,
                  sigma=0.0):
    """Reference sequential greedy NMS.  boxes (N, B, 4), scores
    (N, C, B) → (indices (S, 3), sel_scores (S, 3), valid).

    ``sigma`` > 0 is Soft-NMS with Gaussian weighting (the NMS-5 /
    TF NonMaxSuppressionV5 semantics): each selection decays every
    surviving candidate by ``exp(-0.5·iou²/σ)`` (hard-zeroed past
    ``iou_threshold``), selection stops when the best decayed score
    drops to ``score_threshold``, and the reported score is the decayed
    one.  The eager per-step decay here is equivalent to the lazy
    re-queued form in the TF kernel."""
    n, num_boxes, _ = boxes.shape
    classes = scores.shape[1]
    per_class = num_boxes if max_boxes <= 0 else min(max_boxes, num_boxes)
    rows = []
    for b in range(n):
        corner = _corner(boxes[b].astype(np.float64), p["box_encoding"])
        iou = _iou_np(corner)
        for c in range(classes):
            s = scores[b, c].astype(np.float64)
            if sigma > 0.0:
                w_mat = np.where(iou <= iou_thr,
                                 np.exp(-0.5 * iou * iou / sigma), 0.0)
                s = s.copy()
                for _ in range(per_class):
                    i = int(np.argmax(s))
                    if not s[i] > score_thr:
                        break
                    rows.append((b, c, i, s[i]))
                    s = s * w_mat[i]
                    s[i] = -np.inf
                continue
            order = np.argsort(-s, kind="stable")
            kept = []
            for i in order:
                if s[i] <= score_thr or len(kept) >= per_class:
                    # spec: score_threshold strictly-greater filter
                    continue
                if any(iou[i, j] > iou_thr for j in kept):
                    continue
                kept.append(int(i))
            rows.extend((b, c, i, s[i]) for i in kept)
    if p["sort_result_descending"]:
        rows.sort(key=lambda r: (-r[3], r[0], r[1], r[2]))
    S = n * classes * per_class
    idx = np.full((S, 3), -1, np.int64)
    sel = np.full((S, 3), -1.0, np.float32)
    for k, (b, c, i, sc) in enumerate(rows):
        idx[k] = (b, c, i)
        sel[k] = (b, c, sc)
    return idx, sel, np.asarray([len(rows)], np.int64)


@register
class NonMaxSuppression(Op):
    type_name = "NonMaxSuppression"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        S = _sel_bound(node, in_shapes, in_values)
        p0, p1, p2 = _ports(node)
        return ShapeResult({p0: (S, 3), p1: (S, 3), p2: (1,)})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        p = _params(node)
        max_boxes, iou_thr, score_thr, sigma = _static_inputs(
            node, None, inputs)
        idx, sel, valid = nms_greedy_np(
            inputs[0], inputs[1], max_boxes, iou_thr, score_thr, p,
            sigma=sigma)
        if p["output_type"] == "i32":
            idx = idx.astype(np.int32)
            valid = valid.astype(np.int32)
        p0, p1, p2 = _ports(node)
        return {p0: idx, p1: sel, p2: valid}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        p = _params(node)
        max_boxes, iou_thr, score_thr, sigma = _static_inputs(
            node, {i: ctx.static_value(node, i) for i in (2, 3, 4, 5)
                   if i in node.inputs})
        boxes = inputs[0].nchw().astype(jnp.float32)   # (N, B, 4)
        scores = inputs[1].nchw().astype(jnp.float32)  # (N, C, B)
        n, num_boxes, _ = boxes.shape
        classes = scores.shape[1]
        per_class = (num_boxes if max_boxes <= 0
                     else min(max_boxes, num_boxes))

        if p["box_encoding"] == "center":
            cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2],
                            boxes[..., 3])
            corner = jnp.stack(
                [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)
        else:
            y1 = jnp.minimum(boxes[..., 0], boxes[..., 2])
            x1 = jnp.minimum(boxes[..., 1], boxes[..., 3])
            y2 = jnp.maximum(boxes[..., 0], boxes[..., 2])
            x2 = jnp.maximum(boxes[..., 1], boxes[..., 3])
            corner = jnp.stack([y1, x1, y2, x2], axis=-1)

        def iou_mat(b):
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            yy1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
            xx1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
            yy2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
            xx2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
            inter = jnp.clip(yy2 - yy1, 0) * jnp.clip(xx2 - xx1, 0)
            union = area[:, None] + area[None, :] - inter
            return jnp.where(union > 0, inter / union, 0.0)

        def one_class(iou, s):
            """Sequential greedy sweep in score order → (keep mask over
            boxes, count)."""
            order = jnp.argsort(-s, stable=True)
            valid_sorted = s[order] > score_thr
            iou_sorted = iou[order][:, order]
            keep_sorted, cnt = greedy_nms_sweep(
                iou_sorted, valid_sorted, iou_thr, per_class)
            keep = jnp.zeros(num_boxes, bool).at[order].set(keep_sorted)
            return keep, cnt

        iou_all = jax.vmap(iou_mat)(corner)                     # (N, B, B)

        if sigma > 0.0:
            return self._emit_soft(
                node, p, iou_all, scores, n, classes, num_boxes,
                per_class, iou_thr, score_thr, sigma)
        keep, cnt = jax.vmap(
            lambda io, sc: jax.vmap(lambda s: one_class(io, s))(sc)
        )(iou_all, scores)                                      # (N, C, B)

        # flatten kept candidates into the padded (S, 3) layout: rank all
        # (b, c, i) by validity then score (then b, c, box for the
        # grouped layout), take the first S
        S = n * classes * per_class
        valid = keep.reshape(-1)
        flat_scores = scores.reshape(-1)
        b_idx, c_idx, i_idx = jnp.unravel_index(
            jnp.arange(n * classes * num_boxes),
            (n, classes, num_boxes))
        if p["sort_result_descending"]:
            # ties: stable sort on the flat index == (b, c, box) order,
            # matching the numpy reference's (-score, b, c, i) key
            rank_key = jnp.where(valid, -flat_scores, jnp.inf)
            order = jnp.argsort(rank_key, stable=True)[:S]
        else:
            # grouped layout: (b, c) blocks, score order within a block —
            # an exact integer key: group * B + rank-within-class
            rank_in = jnp.argsort(
                jnp.argsort(-scores, axis=-1, stable=True),
                axis=-1, stable=True).reshape(-1)
            group = b_idx * classes + c_idx
            key = group * num_boxes + rank_in
            rank_key = jnp.where(valid, key, n * classes * num_boxes + 1)
            order = jnp.argsort(rank_key, stable=True)[:S]
        ok = valid[order]
        idx = jnp.stack(
            [b_idx[order], c_idx[order], i_idx[order]], axis=1)
        sel = jnp.stack(
            [b_idx[order].astype(jnp.float32),
             c_idx[order].astype(jnp.float32),
             flat_scores[order]], axis=1)
        idx = jnp.where(ok[:, None], idx, -1)
        sel = jnp.where(ok[:, None], sel, -1.0)
        total = cnt.sum().reshape(1)
        # i64 output_type lands on i32 device-side (jax x64 is disabled;
        # box/class indices always fit) — Result casts to the declared
        # dtype on fetch
        out_dt = jnp.int32
        p0, p1, p2 = _ports(node)
        return {
            p0: TValue(idx.astype(out_dt), "L"),
            p1: TValue(sel.astype(jnp.float32), "L"),
            p2: TValue(total.astype(out_dt), "L"),
        }

    def _emit_soft(self, node, p, iou_all, scores, n, classes, num_boxes,
                   per_class, iou_thr, score_thr, sigma):
        """Soft-NMS (sigma > 0): per (batch, class), iteratively select
        the argmax of the decayed scores, multiplying survivors by
        ``exp(-0.5·iou²/σ)`` (0 past iou_threshold) after each pick — the
        eager equivalent of the TF V5 / NMS-5 lazy re-queued kernel.
        Fixed shapes throughout: a fori_loop over the per_class keep
        budget, vmapped over (batch, class)."""
        import jax
        import jax.numpy as jnp

        def one_class(iou, s):
            w_mat = jnp.where(iou <= iou_thr,
                              jnp.exp(-0.5 * iou * iou / sigma), 0.0)

            def body(k, carry):
                s_cur, sel_i, sel_s, cnt = carry
                i = jnp.argmax(s_cur)
                ok = s_cur[i] > score_thr
                sel_i = sel_i.at[k].set(jnp.where(ok, i, -1))
                sel_s = sel_s.at[k].set(jnp.where(ok, s_cur[i], -1.0))
                decayed = (s_cur * w_mat[i]).at[i].set(-jnp.inf)
                s_cur = jnp.where(ok, decayed, s_cur)
                return s_cur, sel_i, sel_s, cnt + ok.astype(jnp.int32)

            _, sel_i, sel_s, cnt = jax.lax.fori_loop(
                0, per_class, body,
                (s.astype(jnp.float32),
                 jnp.full((per_class,), -1, jnp.int32),
                 jnp.full((per_class,), -1.0, jnp.float32),
                 jnp.int32(0)))
            return sel_i, sel_s, cnt

        sel_i, sel_s, cnt = jax.vmap(
            lambda io, sc: jax.vmap(lambda s: one_class(io, s))(sc)
        )(iou_all, scores)          # (N, C, per_class) ×2, (N, C)

        S = n * classes * per_class
        b_idx, c_idx, _ = jnp.unravel_index(
            jnp.arange(S), (n, classes, per_class))
        flat_i = sel_i.reshape(-1)
        flat_s = sel_s.reshape(-1)
        valid = flat_i >= 0
        if p["sort_result_descending"]:
            order = jnp.argsort(
                jnp.where(valid, -flat_s, jnp.inf), stable=True)
        else:
            # selection slots are already (b, c, pick-order); just pack
            # the valid prefix rows of every class to the front
            order = jnp.argsort(~valid, stable=True)
        ok = valid[order]
        idx = jnp.stack(
            [b_idx[order], c_idx[order], flat_i[order]], axis=1)
        sel = jnp.stack(
            [b_idx[order].astype(jnp.float32),
             c_idx[order].astype(jnp.float32), flat_s[order]], axis=1)
        idx = jnp.where(ok[:, None], idx, -1)
        sel = jnp.where(ok[:, None], sel, -1.0)
        p0, p1, p2 = _ports(node)
        return {
            p0: TValue(idx.astype(jnp.int32), "L"),
            p1: TValue(sel, "L"),
            p2: TValue(cnt.sum().reshape(1).astype(jnp.int32), "L"),
        }
