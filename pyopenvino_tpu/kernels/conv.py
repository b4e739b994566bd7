"""Convolution as patch-extraction + the fused MXU GEMM kernel.

The reference's fastest Convolution kernel materializes an im2col matrix and
runs one numpy GEMM (op_plugins/Convolution.py:57-87).  The TPU-native form:
patches are extracted by XLA (static strided slices, fused into the
surrounding program — for the dominant 1×1 convs this is a plain reshape,
zero copies) and the GEMM runs as the Pallas kernel with INT8 dequant, bias
and activation fused into its epilogue (kernels/gemm.py).  Dilation is
honoured (the reference's im2col path ignores it, Convolution.py:87) and
batch-N is native — the batch rides the GEMM's M dimension.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from pyopenvino_tpu.kernels.gemm import fused_gemm


def extract_patches(x, kh, kw, sh, sw, dh, dw, pads):
    """(N, H, W, C) → ((N, OH, OW, kh*kw*C) patches, oh, ow).

    Patch features are ordered (kh, kw, C) — matching an OIHW weight
    reshaped via transpose(2, 3, 1, 0).reshape(kh*kw*ci, co).
    """
    (pt, pb), (pl, pr) = pads
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    h, w = x.shape[1:3]
    oh = (h - (dh * (kh - 1) + 1)) // sh + 1
    ow = (w - (dw * (kw - 1) + 1)) // sw + 1
    if kh == kw == 1:
        patch = x[:, : sh * (oh - 1) + 1 : sh, : sw * (ow - 1) + 1 : sw, :]
        return patch, oh, ow
    parts = []
    for i in range(kh):
        for j in range(kw):
            i0, j0 = i * dh, j * dw
            parts.append(
                x[:, i0 : i0 + sh * (oh - 1) + 1 : sh,
                  j0 : j0 + sw * (ow - 1) + 1 : sw, :]
            )
    return jnp.concatenate(parts, axis=-1), oh, ow


def conv2d_fused(
    x,                      # (N, H, W, C) activations, channels-last
    w,                      # (O, I, Kh, Kw) weights — float or int8
    scale=None,             # (O,) per-output-channel dequant scales
    bias=None,              # (O,) bias, fused into the epilogue
    act: Optional[tuple] = None,   # None | ("relu",0,0) | ("clamp",lo,hi)
    strides: Tuple[int, int] = (1, 1),
    dilations: Tuple[int, int] = (1, 1),
    pads=((0, 0), (0, 0)),
    out_dtype=None,
    interpret: bool = False,
):
    """Returns (N, OH, OW, O) in out_dtype (default x.dtype)."""
    n = x.shape[0]
    co, ci, kh, kw = w.shape
    (sh, sw), (dh, dw) = strides, dilations
    patches, oh, ow = extract_patches(x, kh, kw, sh, sw, dh, dw, pads)
    k = kh * kw * ci
    a = patches.reshape(n * oh * ow, k)
    wmat = jnp.transpose(w, (2, 3, 1, 0)).reshape(k, co)
    out = fused_gemm(
        a, wmat, scale=scale, bias=bias, act=act,
        out_dtype=out_dtype or x.dtype, interpret=interpret,
    )
    return out.reshape(n, oh, ow, co)
