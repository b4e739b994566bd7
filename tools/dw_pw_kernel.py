"""Fused depthwise(3x3, stride 1) + pointwise(1x1) conv — one Pallas kernel.

MobileNet's separable block is two back-to-back convs; under the INT8-FULL
dataflow each runs at the int8 HBM byte floor, so the depthwise INTERMEDIATE
(write + re-read, 2·H·W·C bytes per image) is pure bandwidth tax — XLA cannot
fuse conv into conv.  This kernel keeps that intermediate in VMEM:

  x int8 (N,H,W,C) ─ HBM read ─► pad into VMEM scratch
    ─► dw: 9 static-offset tap MACs, exact int32 accumulation (VPU)
    ─► dequant·(s_x·s_wdw[c]) + bias + clamp (f32)      [dw epilogue]
    ─► requantize to int8 at the calibrated mid scale
    ─► pw: (H·W', C) @ (C, Co) int8×int8 on the MXU, int32 accumulation
    ─► dequant·(s_mid·s_wpw[o]) + bias + clamp (f32)    [pw epilogue]
    ─► requantize at the output storage scale ─ HBM write ─► int8 (N,H,W,Co)

Grid covers the batch G images at a time, whole feature maps in VMEM (the caller
gates on a VMEM estimate; SSD's stride-1 pairs from 75x75x128 down all fit).
The padded row-space trick: the image lives in scratch as ((H+2)·(W+2), C)
rows, so every dw tap is ONE static sublane-offset slice (offset
dy·(W+2)+dx) — no relayout-prone (H, W, C) → (H·W, C) reshape.  The pw
matmul runs over H·(W+2) rows including the two pad columns per row (~2.6%
wasted MACs at W=75); a compaction loop drops them on the way to the output
block.

Numerics match the XLA INT8-FULL path op-for-op: integer accumulation is
exact, epilogues are f32, and both requantizations use TValue.quantize
semantics (round, clip ±127).

Reference being outrun: op_plugins/GroupConvolution.py:53-79 +
Convolution.py:57-113 execute the pair as two separate Python-dispatched
nodes with an HBM-resident (there: host-resident) intermediate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(x, act):
    if act is None:
        return x
    kind, lo, hi = act
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "clamp":
        return jnp.clip(x, lo, hi)
    raise ValueError(kind)


def _requant(x, scale):
    """TValue.quantize semantics: round(x/scale), clip to ±127, int8."""
    return jnp.clip(jnp.round(x * (1.0 / scale)), -127, 127).astype(jnp.int8)


def _round_up(x, m):
    return (x + m - 1) // m * m


# Mosaic requires dynamic sublane offsets to be provable multiples of 8, so
# the row-space uses pitch P = round_up(W+2, 8) with the image row stored at
# (y+1)*P + L (L = 8): every dynamic store/read offset is a multiple of 8,
# while the 9 tap offsets (dy*P + L-1 + dx) stay STATIC slices.  Rows beyond
# x = W in the P-pitched accumulator are garbage (they read into the next
# row's data) and are dropped by the compaction loop — the MAC waste is
# P/W - 1 (≤7% at SSD's 75/38-px layers, ~26% at 19 px).
_L = 8


def _make_kernel(G, H, W, C, Co, dw_act, pw_act, s_mid, s_out, out_dtype):
    P = _round_up(W + 2, 8)
    M = H * P
    S = (H + 2) * P  # per-image row stride in the shared scratch

    def kernel(x_ref, wdw_ref, dws_ref, dwb_ref, wpw_ref, pws_ref, pwb_ref,
               out_ref, x2_ref, oq_ref):
        # 1. zero-pad all G images into the flattened row-space scratch
        x2_ref[:] = jnp.zeros_like(x2_ref)

        def fill(i, _):
            g, y = i // H, i % H
            x2_ref[pl.ds(g * S + (y + 1) * P + _L, W), :] = x_ref[g, y, :, :]
            return 0

        jax.lax.fori_loop(0, G * H, fill, 0, unroll=False)

        # Per-image pipeline, Python-unrolled over g so every tap slice has
        # a STATIC offset (Mosaic requires dynamic sublane offsets to be
        # provable multiples of 8; dx taps are ±1).  Unrolling also keeps
        # the big int32 accumulators per-image (VMEM-bounded) while the G
        # images amortize the grid-step pipeline overhead.
        for g in range(G):
            base = g * S
            # 2. depthwise 3x3 as 9 static-offset tap MACs, exact int32
            acc = jnp.zeros((M, C), jnp.int32)
            for t in range(9):
                off = base + (t // 3) * P + _L - 1 + (t % 3)
                tap = x2_ref[off:off + M, :].astype(jnp.int32)
                acc = acc + tap * wdw_ref[t, :].astype(jnp.int32)[None, :]

            # 3. dw epilogue (f32) + mid requantize
            y1 = acc.astype(jnp.float32) * dws_ref[0, :][None, :]
            y1 = y1 + dwb_ref[0, :][None, :]
            y1 = _apply_act(y1, dw_act)
            q = _requant(y1, s_mid)

            # 4. pointwise on the MXU, int8×int8 → int32
            pacc = jnp.dot(q, wpw_ref[:], preferred_element_type=jnp.int32)

            # 5. pw epilogue (f32) + output store
            o = pacc.astype(jnp.float32) * pws_ref[0, :][None, :]
            o = o + pwb_ref[0, :][None, :]
            o = _apply_act(o, pw_act)
            if s_out is not None:
                oq_ref[g * M:(g + 1) * M, :] = _requant(o, s_out)
            else:
                oq_ref[g * M:(g + 1) * M, :] = o.astype(out_dtype)

        # 6. compact the P-pitched row-space (drop the pad/garbage cols)
        def compact(i, _):
            g, y = i // H, i % H
            out_ref[g, y, :, :] = oq_ref[pl.ds(g * M + y * P, W), :]
            return 0

        jax.lax.fori_loop(0, G * H, compact, 0, unroll=False)

    return kernel


def vmem_estimate(H, W, C, Co, G: int = 1) -> int:
    """Rough peak VMEM bytes: scratches + the dominant SSA temporaries."""
    P = _round_up(W + 2, 8)
    M = H * P
    S = (H + 2) * P
    x2 = (G * S + 16) * C                      # int8 scratch (all G images)
    acc = M * C * 4                            # int32 dw accumulator (1 img)
    y1 = M * C * 4                             # f32 epilogue temp
    q = M * C                                  # int8 mid tensor
    pacc = M * Co * 4                          # int32 pw accumulator
    of = M * Co * 4                            # f32 pw epilogue temp
    oq = G * M * Co                            # int8 out scratch
    io = 2 * G * (H * W * C + H * W * Co)      # double-buffered in/out blocks
    return x2 + acc + y1 + q + pacc + of + oq + io


def pick_group(n, H, W, C, Co, budget: int = 12 * 1024 * 1024) -> int:
    """Largest images-per-grid-step in {8,4,2,1} that divides n and fits."""
    for g in (8, 4, 2, 1):
        if n % g == 0 and vmem_estimate(H, W, C, Co, g) <= budget:
            return g
    return 1


def _impl(x, w_dw, dw_scale, dw_bias, w_pw, pw_scale, pw_bias, *,
          dw_act, pw_act, s_mid, s_out, out_dtype, interpret):
    n, H, W, C = x.shape
    c2, Co = w_pw.shape
    assert c2 == C, (w_pw.shape, x.shape)
    P = _round_up(W + 2, 8)
    M = H * P
    S = (H + 2) * P
    odt = jnp.int8 if s_out is not None else out_dtype
    G = pick_group(n, H, W, C, Co)

    kernel = _make_kernel(
        G, H, W, C, Co, dw_act, pw_act, s_mid, s_out, out_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, W, Co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H, W, Co), odt),
        scratch_shapes=[
            pltpu.VMEM((G * S + 16, C), jnp.int8),
            pltpu.VMEM((G * M, Co), odt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * (18 * H * W * C + 2 * M * C * Co),
            bytes_accessed=n * (H * W * C + H * W * Co) + C * Co + 9 * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_dw, dw_scale.reshape(1, C), dw_bias.reshape(1, C),
      w_pw, pw_scale.reshape(1, Co), pw_bias.reshape(1, Co))
    return out


@functools.lru_cache(maxsize=None)
def _make_core(dw_act, pw_act, s_mid, s_out, out_dtype_name, interpret):
    out_dtype = jnp.dtype(out_dtype_name) if out_dtype_name else None

    @jax.custom_batching.custom_vmap
    def core(x, w_dw, dw_scale, dw_bias, w_pw, pw_scale, pw_bias):
        return _impl(x, w_dw, dw_scale, dw_bias, w_pw, pw_scale, pw_bias,
                     dw_act=dw_act, pw_act=pw_act, s_mid=s_mid, s_out=s_out,
                     out_dtype=out_dtype, interpret=interpret)

    @core.def_vmap
    def _rule(axis_size, in_batched, x, *ws):
        # weights are per-network constants; the batch folds into the
        # kernel's image grid dimension (one grid step per image)
        if any(in_batched[1:]):
            raise NotImplementedError("dw_pw_fused: batched weights")
        if not in_batched[0]:
            return core(x, *ws), False
        b, n = x.shape[0], x.shape[1]
        out = core(x.reshape(b * n, *x.shape[2:]), *ws)
        return out.reshape(b, n, *out.shape[1:]), True

    return core


def dw_pw_fused(
    x,
    w_dw,
    dw_scale,
    dw_bias,
    w_pw,
    pw_scale,
    pw_bias,
    *,
    dw_act: Optional[tuple] = ("clamp", 0.0, 6.0),
    pw_act: Optional[tuple] = None,
    s_mid: float,
    s_out: Optional[float] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fused stride-1 3x3-depthwise + 1x1-pointwise int8 conv pair.

    x:        (N, H, W, C) int8 activation codes (storage scale folded
              into dw_scale by the caller)
    w_dw:     (9, C) int8 — depthwise taps, row t = (dy=t//3, dx=t%3)
    dw_scale: (C,) f32 = s_x · s_wdw[c] (dequant of the int32 dw acc)
    dw_bias:  (C,) f32
    w_pw:     (C, Co) int8 pointwise weights
    pw_scale: (Co,) f32 = s_mid · s_wpw[o]
    pw_bias:  (Co,) f32
    s_mid:    calibrated scale of the intermediate (static)
    s_out:    output storage scale → int8 out; None → out_dtype out

    vmap-safe: extra batch dims fold into the image grid (see _make_core).
    """
    core = _make_core(
        dw_act, pw_act, float(s_mid),
        float(s_out) if s_out is not None else None,
        jnp.dtype(out_dtype).name if out_dtype is not None else None,
        interpret,
    )
    return core(x, w_dw, dw_scale, dw_bias, w_pw, pw_scale, pw_bias)
