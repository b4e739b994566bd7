"""Axis softmax as a Pallas VPU kernel (last-axis, numerically stable).

The reference normalizes over the whole tensor and skips max-subtraction
(op_plugins/SoftMax.py:10-25 — overflow risk, SURVEY.md §2.2); this kernel
is the corrected semantics on-chip: rows tile over the grid, each block
computes max → exp → sum → divide entirely in VMEM with one HBM read and
one write per element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyopenvino_tpu.kernels.util import round_up


def _kernel(x_ref, out_ref, *, valid_cols: int):
    x = x_ref[:].astype(jnp.float32)
    # mask padded lanes out of the reduction
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    neg = jnp.full_like(x, -jnp.inf)
    xm = jnp.where(col < valid_cols, x, neg)
    m = jnp.max(xm, axis=1, keepdims=True)
    e = jnp.where(col < valid_cols, jnp.exp(x - m), 0.0)
    s = jnp.sum(e, axis=1, keepdims=True)
    out_ref[:] = (e / s).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def softmax_rows(x, interpret: bool = False):
    """Softmax over the last axis of a 2-D array."""
    m, n = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    tm = min(512, round_up(m, sublane))
    np_ = round_up(n, 128)
    mp = round_up(m, tm)
    if (mp, np_) != (m, n):
        x = jnp.pad(x, ((0, mp - m), (0, np_ - n)))
    out = pl.pallas_call(
        functools.partial(_kernel, valid_cols=n),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tm, np_), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        interpret=interpret,
    )(x)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
