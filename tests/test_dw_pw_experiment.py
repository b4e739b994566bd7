"""CI guard for the fused dw+pw experiment kernel (tools/dw_pw_kernel.py).

The kernel is a recorded negative result (docs/MEASUREMENTS.md: parity at
best vs the XLA int8 conv pair at batch 256, so it is NOT routed in
production) — but it is chip-validated bit-exact library code kept with its
microbench for reproduction, so this interpret-mode test keeps it from
rotting.  Semantics under test: 3x3/s1 depthwise (exact int32 taps) + f32
epilogue + mid requantize + 1x1 pointwise (int8xint8) + f32 epilogue +
output requantize, all matching the XLA INT8-FULL path op-for-op.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _ref(x, wdw, dws, dwb, wpw, pws, pwb, s_mid, s_out):
    n, h, w, c = x.shape
    xp = np.pad(x.astype(np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros((n, h, w, c), np.int32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        acc += xp[:, dy:dy + h, dx:dx + w, :] * wdw[t].astype(np.int32)
    y1 = np.clip(acc.astype(np.float32) * dws + dwb, 0.0, 6.0)
    q = np.clip(np.round(y1 / s_mid), -127, 127).astype(np.int8)
    pacc = np.einsum(
        "nhwc,co->nhwo", q.astype(np.int32), wpw.astype(np.int32))
    o = np.clip(pacc.astype(np.float32) * pws + pwb, 0.0, 6.0)
    return np.clip(np.round(o / s_out), -127, 127).astype(np.int8)


@pytest.mark.parametrize(
    "n,h,w,c,co",
    [(2, 10, 10, 32, 64),   # G=2 grouping path
     (8, 19, 21, 64, 32),   # G=8, W not a multiple of the row pitch
     (1, 7, 9, 16, 16)],    # G=1, tiny odd shape
)
def test_dw_pw_fused_matches_numpy(n, h, w, c, co):
    import jax.numpy as jnp

    from dw_pw_kernel import dw_pw_fused

    rng = np.random.default_rng(42)
    x = rng.integers(-127, 128, (n, h, w, c), dtype=np.int8)
    wdw = rng.integers(-127, 128, (9, c), dtype=np.int8)
    dws = rng.uniform(1e-4, 1e-3, c).astype(np.float32)
    dwb = rng.uniform(-1, 1, c).astype(np.float32)
    wpw = rng.integers(-127, 128, (c, co), dtype=np.int8)
    pws = rng.uniform(1e-4, 1e-3, co).astype(np.float32)
    pwb = rng.uniform(-1, 1, co).astype(np.float32)
    s_mid, s_out = 0.05, 0.04

    want = _ref(x, wdw, dws, dwb, wpw, pws, pwb, s_mid, s_out)
    got = dw_pw_fused(
        jnp.asarray(x), jnp.asarray(wdw), jnp.asarray(dws), jnp.asarray(dwb),
        jnp.asarray(wpw), jnp.asarray(pws), jnp.asarray(pwb),
        dw_act=("clamp", 0.0, 6.0), pw_act=("clamp", 0.0, 6.0),
        s_mid=s_mid, s_out=s_out, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
