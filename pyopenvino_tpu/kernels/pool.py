"""2-D max/avg pooling as Pallas VPU kernels (channels-last).

Window extrema/sums compute as kh·kw shifted reductions over a
VMEM-resident block — the same shifted-access insight as the depthwise conv
(ops/conv.py _depthwise_shifted_mac), with channels riding the 128-lane
axis.  Blocks tile over (batch × output-row) so arbitrarily large batches
stream through fixed VMEM.  Semantics match ops/pool.py's numpy reference:
zero excluded from max via -inf padding (the reference's naive MaxPool
max-inits to 0 — MaxPool.py:95, a quirk fixed framework-wide), avg with
exclude-pad (out-of-bounds positions don't count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyopenvino_tpu.kernels.util import round_up


def _pool_kernel(refs, *, kind, kh, kw, sh, sw, oh, ow):
    x_ref = refs[0]
    counts_ref = refs[1] if kind == "avg" else None
    out_ref = refs[-1]
    c = x_ref.shape[-1]
    x = x_ref[0]  # (Hp, Wp, C) — one example's padded feature map
    acc = None
    for i in range(kh):
        for j in range(kw):
            # Mosaic cannot lower strided value-slices (>2D gather), so
            # downsample via contiguous slice + reshape + index-0 picks —
            # the wrapper over-pads so i + oh*sh / j + ow*sw stay in range
            sl = x[i : i + oh * sh, j : j + ow * sw, :]
            sl = sl.reshape(oh, sh, ow * sw * c)[:, 0, :]
            sl = sl.reshape(oh, ow, sw, c)[:, :, 0, :]
            if kind == "max":
                acc = sl if acc is None else jnp.maximum(acc, sl)
            else:
                s = sl.astype(jnp.float32)
                acc = s if acc is None else acc + s
    if kind == "avg":
        # counts = reciprocal valid-window sizes (exclude-pad)
        acc = acc * counts_ref[0]
    out_ref[:] = acc.reshape(1, oh, ow, c).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "kernel", "strides", "pads", "exclude_pad",
                     "interpret"),
)
def pool2d(x, kind, kernel, strides, pads, exclude_pad: bool = True,
           interpret: bool = False):
    """x: (N, H, W, C) → (N, OH, OW, C).  kind: 'max' | 'avg'."""
    n, h, w, c = x.shape
    kh, kw = kernel
    sh, sw = strides
    (pt, pb), (pl_, pr) = pads
    hp, wp = h + pt + pb, w + pl_ + pr
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1

    if kind == "max":
        pad_val = (
            -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min
        )
    else:
        pad_val = 0.0
    # over-pad so the kernel's contiguous-slice downsampling (i + oh*sh
    # rows, j + ow*sw cols) never reads out of range; the extra positions
    # are only ever in discarded stride slots
    hp2 = (kh - 1) + oh * sh
    wp2 = (kw - 1) + ow * sw
    xp = jnp.pad(
        x,
        ((0, 0), (pt, pb + (hp2 - hp)), (pl_, pr + (wp2 - wp)), (0, 0)),
        constant_values=pad_val,
    )
    hp, wp = hp2, wp2

    counts = None
    if kind == "avg" and not exclude_pad:
        counts = jnp.full((1, oh, ow, 1), 1.0 / (kh * kw), jnp.float32)
    elif kind == "avg":
        # exclude-pad reciprocal window sizes, precomputed on host shapes
        ones = jnp.pad(
            jnp.ones((1, h, w, 1), jnp.float32),
            ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
        )
        tot = None
        for i in range(kh):
            for j in range(kw):
                sl = ones[:, i : i + sh * (oh - 1) + 1 : sh,
                          j : j + sw * (ow - 1) + 1 : sw, :]
                tot = sl if tot is None else tot + sl
        counts = 1.0 / tot  # (1, oh, ow, 1)

    def kernel_fn(*refs):
        _pool_kernel(refs, kind=kind, kh=kh, kw=kw, sh=sh, sw=sw,
                     oh=oh, ow=ow)

    in_specs = [
        pl.BlockSpec(
            (1, hp, wp, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    operands = [xp]
    if counts is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, oh, ow, 1), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(counts)

    out = pl.pallas_call(
        kernel_fn,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, oh, ow, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=interpret,
    )(*operands)
    return out
