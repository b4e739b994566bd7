"""Class-agnostic NMS suppression mask as a Pallas kernel.

The irregular heart of SSD's DetectionOutput (reference:
op_plugins/DetectionOutput.py:38-63 — O(n²) Python IoU loops) as fixed-size
masked on-device compute (SURVEY.md §7.5): for each row tile of boxes the
kernel computes IoU against ALL boxes (tile × P fits VMEM even at P≈2048,
unlike the full P×P matrix) and folds the reference's suppression rule —
a box dies if any *valid* box with higher confidence (ties broken by lower
index, matching the reference's keep-the-earlier-box behavior) overlaps it
beyond the threshold.

The surrounding decode/argsort/record-emit stay in XLA (ops/ssd.py);
sorting has no good Pallas form and XLA's is fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyopenvino_tpu.kernels.util import round_up


def _kernel(boxes_ref, conf_ref, valid_ref, keep_ref, *, threshold, tile):
    i = pl.program_id(0)
    row0 = i * tile

    rows = boxes_ref[pl.ds(row0, tile), :]       # (T, 4)
    all_boxes = boxes_ref[:]                     # (P, 4)
    conf_rows = conf_ref[pl.ds(row0, tile), :]   # (T, 1)
    conf_all = conf_ref[:]                       # (P, 1)
    valid_all = valid_ref[:]                     # (P, 1) float 0/1

    rx0, ry0 = rows[:, 0:1], rows[:, 1:2]
    rx1, ry1 = rows[:, 2:3], rows[:, 3:4]
    ax0, ay0 = all_boxes[:, 0], all_boxes[:, 1]
    ax1, ay1 = all_boxes[:, 2], all_boxes[:, 3]

    ix0 = jnp.maximum(rx0, ax0[None, :])
    iy0 = jnp.maximum(ry0, ay0[None, :])
    ix1 = jnp.minimum(rx1, ax1[None, :])
    iy1 = jnp.minimum(ry1, ay1[None, :])
    inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
    area_r = (rx1 - rx0) * (ry1 - ry0)
    area_a = ((ax1 - ax0) * (ay1 - ay0))[None, :]
    iou = inter / (area_r + area_a - inter + 1e-12)

    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, iou.shape, dimension=0
    ) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, iou.shape, dimension=1)
    beats = (conf_all[:, 0][None, :] > conf_rows) | (
        (conf_all[:, 0][None, :] == conf_rows) & (col_ids < row_ids)
    )
    overlap = (iou > threshold) & (col_ids != row_ids)
    kill = jnp.any(
        overlap & beats & (valid_all[:, 0][None, :] > 0.5), axis=1,
        keepdims=True,
    )
    keep_ref[pl.ds(row0, tile), :] = jnp.logical_not(kill).astype(
        jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def nms_keep_mask(boxes, conf, valid, threshold: float,
                  interpret: bool = False):
    """boxes (P,4) f32, conf (P,) f32, valid (P,) bool →
    keep (P,) bool: valid boxes not suppressed by a better valid box."""
    p = boxes.shape[0]
    tile = min(512, round_up(p, 128))
    pp = round_up(p, tile)  # tile must divide the padded row count
    boxes = jnp.pad(boxes.astype(jnp.float32), ((0, pp - p), (0, 0)))
    conf2 = jnp.pad(
        conf.astype(jnp.float32).reshape(-1, 1), ((0, pp - p), (0, 0)),
        constant_values=-jnp.inf,
    )
    valid2 = jnp.pad(
        valid.astype(jnp.float32).reshape(-1, 1), ((0, pp - p), (0, 0))
    )
    keep = pl.pallas_call(
        functools.partial(_kernel, threshold=threshold, tile=tile),
        grid=(pp // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pp, 1), jnp.float32),
        interpret=interpret,
    )(boxes, conf2, valid2)
    return (keep[:p, 0] > 0.5) & valid
