"""Go/no-go microbench: fused dw+pw Pallas kernel vs the XLA two-conv pair.

Compares, at SSD-MobileNet stride-1 separable-block shapes under the
INT8-FULL dataflow (int8 in HBM on both sides):

  XLA:    int8 grouped conv → f32 epilogue → requant int8 (HBM)
          → int8 1x1 conv → f32 epilogue → requant int8
  Pallas: tools/dw_pw_kernel.dw_pw_fused (intermediate never leaves VMEM)

Timing uses a host-fetch barrier (jax.block_until_ready does not block
through the axon tunnel — see .claude/skills/verify/SKILL.md).
"""

import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dw_pw_kernel import dw_pw_fused, vmem_estimate


def xla_pair(x, wdw_hwio, dws, dwb, wpw_hwio, pws, pwb, s_mid, s_out):
    acc = lax.conv_general_dilated(
        x, wdw_hwio, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1], preferred_element_type=jnp.int32)
    y1 = jnp.clip(acc.astype(jnp.float32) * dws + dwb, 0.0, 6.0)
    q = jnp.clip(jnp.round(y1 * (1.0 / s_mid)), -127, 127).astype(jnp.int8)
    acc2 = lax.conv_general_dilated(
        q, wpw_hwio, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    o = jnp.clip(acc2.astype(jnp.float32) * pws + pwb, 0.0, 6.0)
    return jnp.clip(jnp.round(o * (1.0 / s_out)), -127, 127).astype(jnp.int8)


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out[-1].ravel()[0])  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[-1].ravel()[0])
    return (time.perf_counter() - t0) / iters


def run(H, W, C, Co, B, s_mid=0.05, s_out=0.04):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (B, H, W, C), dtype=np.int8))
    wdw = jnp.asarray(rng.integers(-127, 128, (9, C), dtype=np.int8))
    dws = jnp.asarray(rng.uniform(1e-4, 1e-3, C).astype(np.float32))
    dwb = jnp.asarray(rng.uniform(-1, 1, C).astype(np.float32))
    wpw = jnp.asarray(rng.integers(-127, 128, (C, Co), dtype=np.int8))
    pws = jnp.asarray(rng.uniform(1e-4, 1e-3, Co).astype(np.float32))
    pwb = jnp.asarray(rng.uniform(-1, 1, Co).astype(np.float32))

    # (9, C) taps → HWIO (3, 3, 1, C) for grouped conv; (C, Co) → (1,1,C,Co)
    wdw_hwio = wdw.reshape(3, 3, 1, C)
    wpw_hwio = wpw.reshape(1, 1, C, Co)

    xla = jax.jit(lambda *a: xla_pair(*a, s_mid, s_out))
    pal = jax.jit(lambda x, *w: dw_pw_fused(
        x, *w, dw_act=("clamp", 0.0, 6.0), pw_act=("clamp", 0.0, 6.0),
        s_mid=s_mid, s_out=s_out))

    t_x = bench(lambda *a: (xla(x, wdw_hwio, dws, dwb, wpw_hwio, pws, pwb),))
    t_p = bench(lambda *a: (pal(x, wdw, dws, dwb, wpw, pws, pwb),))

    # correctness cross-check on the device
    ox = np.asarray(xla(x, wdw_hwio, dws, dwb, wpw_hwio, pws, pwb))
    op = np.asarray(pal(x, wdw, dws, dwb, wpw, pws, pwb))
    diff = np.abs(ox.astype(int) - op.astype(int)).max()
    est = vmem_estimate(H, W, C, Co) / 1e6
    print(f"{H}x{W}x{C}->{Co} B={B}: xla {t_x*1e3:7.2f} ms  "
          f"pallas {t_p*1e3:7.2f} ms  speedup {t_x/t_p:5.2f}x  "
          f"maxdiff {diff}  vmem_est {est:.1f} MB", flush=True)
    return t_x, t_p, diff


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print("devices:", jax.devices(), flush=True)
    run(19, 19, 512, 512, B)    # dw7-11 (x5 in SSD)
    run(38, 38, 256, 256, B)    # dw5
    run(75, 75, 128, 128, B)    # dw3
    run(10, 10, 1024, 1024, B)  # dw13
