"""Headline benchmark: GoogLeNet-v1 INT8 throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the reference's fastest GoogLeNet-v1 path — the `special`
(im2col+GEMM) kernel at 0.554 s/inf ≈ 1.81 img/s, batch=1 FP32, single CPU
thread (reference: integrity_test_expected_result.txt:50; BASELINE.md).
North-star target is ≥1000× that per chip (BASELINE.json).

Methodology: batch-N inference (vmap'd whole-graph XLA program), steady-state
timing after jit warm-up with a host-fetch barrier on device results.  On
TPU the mode is INT8-FULL — calibrated activation scales, native int8×int8
convs, int8 inter-layer dataflow — the fastest mode since round 2; the CPU
fallback uses INT8 weight-only (int8 emulation on CPU XLA is slow and the
CPU number is only a smoke signal).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_IMG_S = 1.0 / 0.554  # GoogLeNet-v1 `special`, integrity transcript


def main():
    import jax
    import numpy as np

    # Persistent compilation cache: first run warms it, later runs (and
    # later driver rounds) skip the multi-minute XLA/Mosaic compile.
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache — harmless

    from __graft_entry__ import _model_paths
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    batch = 512 if on_tpu else 16
    iters = 20 if on_tpu else 3

    xml, binp = _model_paths("googlenet-v1")
    model = read_ir_model(xml, binp)
    # INT8-FULL (calibrated activations, native int8x8 convs, int8
    # inter-layer dataflow) is the fastest mode since round 2: 19.3k vs
    # 13.6k img/s weight-only at batch 512 on the v5e
    # (docs/MEASUREMENTS.md).
    cfg = Config(
        quant=QuantMode.INT8_FULL if on_tpu else QuantMode.INT8_WEIGHT,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    cal = None
    if cfg.quant == QuantMode.INT8_FULL:
        crng = np.random.default_rng(1)
        cal = [
            {"data": crng.uniform(0, 255, (1, 3, 224, 224)).astype(
                np.float32)}
            for _ in range(2)
        ]
    compiled = compile_model(model, cfg, calibration_samples=cal)

    param = model.parameters[0]
    shape = param.outputs[param.out_port].shape  # (1, 3, 224, 224)
    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (batch,) + shape).astype(np.float32)
    inputs = {param.name: blob}

    fn = compiled.batched_fn(batch)
    dev_inputs = jax.device_put(inputs)

    # Warm-up with a host-fetch barrier: device executions queue in order, so
    # reading one element of the last output proves every prior execution
    # finished.  (block_until_ready is not a reliable barrier through the
    # remote-TPU tunnel this runs under.)
    out = fn(compiled.weights, dev_inputs)
    key = next(iter(out))
    np.asarray(out[key][(0,) * out[key].ndim])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(compiled.weights, dev_inputs)
    np.asarray(out[key][(0,) * out[key].ndim])
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": f"googlenet_v1_int8_throughput_{platform}",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
