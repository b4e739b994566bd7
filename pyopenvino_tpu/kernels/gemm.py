"""Fused MXU GEMM:  out = act((A @ dequant(B)) + bias)  as one Pallas kernel.

This is the single hot kernel behind Convolution (im2col patches → GEMM,
the MXU-native form of the reference's `special` path,
op_plugins/Convolution.py:57-87) and MatMul, with the epilogues the
reference runs as separate graph nodes (Add bias, ReLU, Clamp) folded into
the accumulator while it is still in VMEM:

  * B may be int8 with per-output-column scales (weight-only INT8): the tile
    is upcast to the compute dtype on the VPU after the (cheap) int8 HBM
    load, and the per-column scale is applied to the f32 accumulator —
    mathematically identical to dequantizing the weights first, since the
    scale is constant along the contracted axis.
  * bias/activation run on the accumulator before the single HBM write-back.

Grid is (M/TM, N/TN, K/TK) with K innermost ("arbitrary" semantics); a VMEM
f32 scratch accumulates across K steps and the epilogue fires on the last
one.  Inputs are zero-padded up to tile multiples by the caller-facing
wrapper (zero rows/cols contribute nothing to the product).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyopenvino_tpu.kernels.util import round_up


def _kernel(a_ref, b_ref, scale_ref, bias_ref, out_ref, acc_ref, *, act, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    b = b_ref[:]
    if a.dtype == jnp.int8 and b.dtype == jnp.int8:
        # full-INT8: int8×int8 on the MXU's double-rate integer path,
        # exact int32 accumulation in the scratch
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.int32)
    else:
        if b.dtype != a.dtype:
            b = b.astype(a.dtype)  # int8 → compute dtype, on the VPU
        # f32 operands need HIGHEST or the MXU silently multiplies in bf16
        precision = (
            jax.lax.Precision.HIGHEST
            if a.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        acc_ref[:] += jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=precision
        )

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[:]
        if scale_ref is not None:
            acc = acc * scale_ref[:].astype(jnp.float32)
        if bias_ref is not None:
            acc = acc + bias_ref[:].astype(jnp.float32)
        if act is not None:
            kind, lo, hi = act
            if kind == "relu":
                acc = jnp.maximum(acc, 0.0)
            elif kind == "clamp":
                acc = jnp.clip(acc, lo, hi)
            else:
                raise ValueError(kind)
        out_ref[:] = acc.astype(out_ref.dtype)


def _pick_tiles(m: int, k: int, n: int, sublane: int):
    tm = min(256, round_up(m, sublane))
    tn = min(256, round_up(n, 128))
    tk = min(512, round_up(k, 128))
    return tm, tk, tn


def _fused_gemm_impl(a, b, scale, bias, *, act, out_dtype, interpret, tiles):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    int_path = a.dtype == jnp.int8 and b.dtype == jnp.int8
    out_dtype = out_dtype or (jnp.float32 if int_path else a.dtype)
    if int_path:
        sublane = 32  # int8 min tile is (32, 128)
    elif a.dtype == jnp.bfloat16:
        sublane = 16
    else:
        sublane = 8
    tm, tk, tn = tiles or _pick_tiles(m, k, n, sublane)
    mp, kp, np_ = round_up(m, tm), round_up(k, tk), round_up(n, tn)

    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    nk = kp // tk
    grid = (mp // tm, np_ // tn, nk)

    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
    ]
    operands = [a, b]
    if scale is not None:
        scale = jnp.pad(scale.reshape(1, n), ((0, 0), (0, np_ - n)))
        in_specs.append(
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(scale)
    if bias is not None:
        bias = jnp.pad(bias.reshape(1, n), ((0, 0), (0, np_ - n)))
        in_specs.append(
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(bias)

    def kernel(*refs):
        pos = 2
        s_ref = b_ref = None
        if scale is not None:
            s_ref = refs[pos]
            pos += 1
        if bias is not None:
            b_ref = refs[pos]
            pos += 1
        _kernel(
            refs[0], refs[1], s_ref, b_ref, refs[pos], refs[pos + 1],
            act=act, nk=nk,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.int32 if int_path else jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * a.dtype.itemsize
            + kp * np_ * b.dtype.itemsize
            + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


@functools.lru_cache(maxsize=None)
def _make_core(act, out_dtype_name, interpret, tiles, has_scale, has_bias):
    """custom_vmap-wrapped GEMM for one static configuration.

    The batching rule is the whole point: under jax.vmap (the compiler's
    batch-N path, runtime/compiler.py batched_fn), a naive lift would run
    one tiny per-example grid per batch element.  Since the weight operands
    (b/scale/bias) are never batched, a batch of GEMMs against one weight
    IS one GEMM — the batch rides the M dimension, restoring full MXU tile
    occupancy at any batch size."""
    import jax.numpy as jnp

    out_dtype = jnp.dtype(out_dtype_name) if out_dtype_name else None

    @jax.custom_batching.custom_vmap
    def core(*ops):
        a, b = ops[0], ops[1]
        pos = 2
        scale = ops[pos] if has_scale else None
        pos += 1 if has_scale else 0
        bias = ops[pos] if has_bias else None
        return _fused_gemm_impl(
            a, b, scale, bias,
            act=act, out_dtype=out_dtype, interpret=interpret, tiles=tiles,
        )

    @core.def_vmap
    def _rule(axis_size, in_batched, *ops):
        if any(in_batched[1:]):
            raise NotImplementedError(
                "fused_gemm vmap over weight operands is unsupported — "
                "weights are per-network constants"
            )
        a = ops[0]
        if not in_batched[0]:
            return core(*ops), False
        lead = a.shape[:-1]  # (B..., M)
        flat = a.reshape(-1, a.shape[-1])
        out = core(flat, *ops[1:])
        return out.reshape(*lead, out.shape[-1]), True

    return core


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret", "tiles")
)
def fused_gemm(
    a,
    b,
    scale=None,
    bias=None,
    act: Optional[tuple] = None,
    out_dtype=None,
    interpret: bool = False,
    tiles: Optional[tuple] = None,
):
    """act((a @ dequant(b)) + bias).

    a:     (M, K) float32/bfloat16
    b:     (K, N) same dtype as `a`, or int8 (weight-only INT8)
    scale: optional (N,) per-output-column dequant scales
    bias:  optional (N,) bias
    act:   None | ("relu", 0, 0) | ("clamp", lo, hi)

    vmap-safe: batched activations collapse into the M dimension (one big
    GEMM), see _make_core.
    """
    core = _make_core(
        act,
        jnp.dtype(out_dtype).name if out_dtype is not None else None,
        interpret,
        tiles,
        scale is not None,
        bias is not None,
    )
    operands = [a, b]
    if scale is not None:
        operands.append(scale)
    if bias is not None:
        operands.append(bias)
    return core(*operands)
