"""Implicit-GEMM spatial convolution — no patch materialization.

The fused-GEMM conv (kernels/conv.py) materializes a kh·kw× patch tensor in
HBM; this kernel instead keeps one example's padded feature map resident in
VMEM and accumulates kh·kw shifted MXU dots:

    out[(y,x), co] = Σ_{i,j}  X[y+i, x+j, :] @ W[i, j, :, co]

Each (i, j) term is a *contiguous* 2-D slice reshaped to (oh·ow, Ci) — the
merge touches only sublane dims, which Mosaic allows (lane dim Ci is
untouched) — times a (Ci, TCo) weight tile.  The epilogue (INT8 dequant ·
per-channel scale, bias, ReLU/Clamp) runs on the f32/int32 accumulator
before the single write-back, exactly like kernels/gemm.py.

Scope: stride 1, dilation 1 (the bulk of spatial convs in these CNNs);
strided convs stay on XLA's implicit-GEMM conv.  Grid is
(batch, co tiles); weights stream per-co-tile while the input block is
revisited."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyopenvino_tpu.kernels.util import round_up


def _kernel(*refs, kh, kw, ci, oh, ow, act, has_scale, has_bias, int_path):
    pos = 2
    x_ref, w_ref = refs[0], refs[1]
    scale_ref = refs[pos] if has_scale else None
    pos += 1 if has_scale else 0
    bias_ref = refs[pos] if has_bias else None
    pos += 1 if has_bias else 0
    out_ref = refs[pos]

    x = x_ref[0]  # (Hp, Wp, Ci)
    acc = None
    for i in range(kh):
        for j in range(kw):
            xs = x[i : i + oh, j : j + ow, :].reshape(oh * ow, ci)
            wk = w_ref[(i * kw + j) * ci : (i * kw + j + 1) * ci, :]
            if int_path:
                d = jnp.dot(xs, wk, preferred_element_type=jnp.int32)
            else:
                precision = (
                    jax.lax.Precision.HIGHEST
                    if xs.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                )
                if wk.dtype != xs.dtype:
                    wk = wk.astype(xs.dtype)
                d = jnp.dot(
                    xs, wk, preferred_element_type=jnp.float32,
                    precision=precision,
                )
            acc = d if acc is None else acc + d

    acc = acc.astype(jnp.float32)
    if scale_ref is not None:
        acc = acc * scale_ref[:].astype(jnp.float32)
    if bias_ref is not None:
        acc = acc + bias_ref[:].astype(jnp.float32)
    if act is not None:
        kind, lo, hi = act
        acc = jnp.maximum(acc, 0.0) if kind == "relu" else jnp.clip(acc, lo, hi)
    tco = out_ref.shape[-1]
    out_ref[:] = acc.reshape(1, oh, ow, tco).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "pads", "out_dtype", "interpret")
)
def conv2d_direct(
    x,                      # (N, H, W, Ci) — float or int8
    w,                      # (Co, Ci, Kh, Kw) — float or int8
    scale=None,             # (Co,) dequant scales
    bias=None,              # (Co,)
    act: Optional[tuple] = None,
    pads=((0, 0), (0, 0)),
    out_dtype=None,
    interpret: bool = False,
):
    """Stride-1, dilation-1 conv.  Returns (N, OH, OW, Co)."""
    n, h, wd, ci = x.shape
    co, ci2, kh, kw = w.shape
    assert ci == ci2, (x.shape, w.shape)
    (pt, pb), (pl_, pr) = pads
    int_path = x.dtype == jnp.int8 and w.dtype == jnp.int8
    out_dtype = out_dtype or (jnp.float32 if int_path else x.dtype)

    oh = h + pt + pb - kh + 1
    ow = wd + pl_ + pr - kw + 1
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    hp, wp = xp.shape[1:3]

    # lane-pad channels; sublane alignment comes from oh*ow merging
    cip = round_up(ci, 128)
    cop = round_up(co, 128)
    tco = min(256, cop)
    if cip != ci:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, cip - ci)))
    wmat = jnp.transpose(w, (2, 3, 1, 0)).reshape(kh * kw, ci, co)
    wmat = jnp.pad(wmat, ((0, 0), (0, cip - ci), (0, cop - co)))
    wmat = wmat.reshape(kh * kw * cip, cop)

    in_specs = [
        pl.BlockSpec(
            (1, hp, wp, cip), lambda b, t: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (kh * kw * cip, tco), lambda b, t: (0, t),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [xp, wmat]
    if scale is not None:
        s = jnp.pad(scale.reshape(1, co), ((0, 0), (0, cop - co)))
        in_specs.append(
            pl.BlockSpec((1, tco), lambda b, t: (0, t),
                         memory_space=pltpu.VMEM)
        )
        operands.append(s)
    if bias is not None:
        bvec = jnp.pad(bias.reshape(1, co), ((0, 0), (0, cop - co)))
        in_specs.append(
            pl.BlockSpec((1, tco), lambda b, t: (0, t),
                         memory_space=pltpu.VMEM)
        )
        operands.append(bvec)

    out = pl.pallas_call(
        functools.partial(
            _kernel, kh=kh, kw=kw, ci=cip, oh=oh, ow=ow, act=act,
            has_scale=scale is not None, has_bias=bias is not None,
            int_path=int_path,
        ),
        grid=(n, cop // tco),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, oh, ow, tco), lambda b, t: (b, 0, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cop), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*operands)
    if cop != co:
        out = out[..., :co]
    return out
