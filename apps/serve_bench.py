"""Serving benchmark — throughput + latency percentiles through the
continuous-batching server (BASELINE.md report points: img/s and p50).

Two workloads:
  * closed-loop single stream — one request at a time (the reference's
    draw-and-infer tick loop shape, draw-and-infer.py:54-76): p50 here is
    end-to-end request latency;
  * open-loop concurrent clients — N threads firing continuously: measures
    coalescing efficiency (requests per device launch) and tail latency
    under load.

NOTE on this rig: the TPU is behind a tunnel with ~50-70 ms per-call RTT, so
absolute latency includes the tunnel, not just the chip; the relative
numbers (coalescing factor, p99/p50 ratio) are the portable signal.

Usage:
    python apps/serve_bench.py --model mnist --clients 16 --seconds 10
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="mnist",
                    choices=["mnist", "mnist_bn", "googlenet-v1",
                             "ssd_mobilenet_v1_coco", "resnet18",
                             "mobilenet-v2", "shufflenet-v2",
                             "efficientnet-b0", "squeezenet-1.1"])
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--quant", default="none", choices=["none", "int8w"])
    ap.add_argument("--device", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--buckets", default="1,2,4,8,16,32")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache"),
        )
    except Exception:
        pass

    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.serving import InferenceServer

    xml, binp = _model_paths(args.model)
    model = read_ir_model(xml, binp)
    cfg = Config(
        quant=QuantMode.INT8_WEIGHT if args.quant == "int8w" else QuantMode.NONE
    )
    compiled = compile_model(model, cfg)
    param = model.parameters[0]
    shape = param.outputs[param.out_port].shape
    blob = np.random.default_rng(0).uniform(0, 255, shape).astype(np.float32)
    buckets = tuple(int(b) for b in args.buckets.split(","))

    report = {"model": args.model, "quant": args.quant,
              "platform": jax.devices()[0].platform}

    # -- closed-loop single stream -------------------------------------------
    srv0 = InferenceServer(compiled, buckets=buckets)
    srv0.start(warmup=True)  # compile every bucket before measuring
    with srv0 as srv:
        srv.infer({param.name: blob})
        lat = []
        t_end = time.perf_counter() + min(args.seconds, 5.0)
        while time.perf_counter() < t_end:
            t0 = time.perf_counter()
            srv.infer({param.name: blob})
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        report["single_stream"] = {
            "requests": int(lat.size),
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
            "img_s": round(1e3 / float(np.mean(lat)), 1),
        }

    # -- open-loop concurrent clients ----------------------------------------
    srv = InferenceServer(compiled, buckets=buckets, max_delay_ms=2.0).start()
    try:
        srv.infer({param.name: blob})  # buckets already compiled above
        stop = threading.Event()
        counts = [0] * args.clients

        def client(i):
            while not stop.is_set():
                srv.infer({param.name: blob})
                counts[i] += 1

        threads = [
            threading.Thread(target=client, args=(i,), daemon=True)
            for i in range(args.clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(args.seconds)
        stop.set()
        for t in threads:
            t.join(timeout=30)
        dt = time.perf_counter() - t0
        s = srv.stats
        report["concurrent"] = {
            "clients": args.clients,
            "requests": int(sum(counts)),
            "img_s": round(sum(counts) / dt, 1),
            "requests_per_launch": round(
                s.requests / max(1, s.batches), 2
            ),
            "p50_ms": round(s.p50_ms, 2),
            "p99_ms": round(s.p99_ms, 2),
        }
    finally:
        srv.stop()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
