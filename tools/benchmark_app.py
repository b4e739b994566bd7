"""benchmark_app — OpenVINO's standard benchmarking tool, TPU-native.

Parity with ``benchmark_app -m model.xml -d DEVICE`` (the tool every
OpenVINO deployment guide leads with; the reference repo has no
benchmarking tool at all — its apps print a single wall-clock per run,
test_pyopenvino.py style).  Reports the same summary block: iteration
count, total duration, latency median/average/min/max percentiles, and
throughput.

Hints map to the TPU execution modes:

  * ``-hint latency``     batch=1 synchronous ``infer`` loop — measures
    the single-stream round trip (host→HBM→MXU→host, through the axon
    tunnel when on TPU).
  * ``-hint throughput``  vmap-batched ``infer_batch`` at ``-b`` (default
    32) — the MXU-saturating mode, reported in samples/s.
  * ``-api async``        AsyncInferQueue over ``-nireq`` request slots —
    the continuous-batching server coalesces in-flight requests into
    shared device launches (serving/server.py).

Usage:
    python tools/benchmark_app.py -m googlenet-v1 -d tpu -hint throughput
    python tools/benchmark_app.py -m path/to/model.xml -niter 200
    python tools/benchmark_app.py -m mnist -api async -nireq 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def resolve_model(name: str):
    """(xml, bin) from a family name or an explicit .xml path."""
    if name.endswith(".xml"):
        binp = name[:-4] + ".bin"
        return name, (binp if os.path.exists(binp) else None)
    from __graft_entry__ import _model_paths

    return _model_paths(name)


def random_feeds(net, batch: int | None, rng):
    """{input: blob} at declared shapes (batch=None) or with the declared
    unit batch dim replaced by ``batch`` (infer_batch contract)."""
    feeds = {}
    for info in net.inputs:
        shape = tuple(info["shape"])
        if batch is not None:
            shape = (batch,) + shape[1:]
        feeds[info["name"]] = rng.uniform(0, 255, shape).astype(np.float32)
    return feeds


def percentiles(lat_ms):
    lat = np.sort(np.asarray(lat_ms))
    return {
        "Median": float(np.percentile(lat, 50)),
        "Average": float(lat.mean()),
        "Min": float(lat.min()),
        "Max": float(lat.max()),
        "P99": float(np.percentile(lat, 99)),
    }


def run_sync(exe, feeds, niter, t_budget):
    exe.infer(feeds)  # warm-up / compile outside the measurement
    lat, t0 = [], time.perf_counter()
    while len(lat) < niter and time.perf_counter() - t0 < t_budget:
        s = time.perf_counter()
        out = exe.infer(feeds)
        k = next(iter(out))
        np.asarray(out[k]).ravel()[:1]  # tunnel-safe completion barrier
        lat.append((time.perf_counter() - s) * 1e3)
    return lat, 1, time.perf_counter() - t0


def run_batched(exe, feeds, niter, t_budget, batch):
    exe.infer_batch(feeds)  # warm-up
    lat, t0 = [], time.perf_counter()
    while len(lat) < niter and time.perf_counter() - t0 < t_budget:
        s = time.perf_counter()
        out = exe.infer_batch(feeds)
        k = next(iter(out))
        np.asarray(out[k]).ravel()[:1]
        lat.append((time.perf_counter() - s) * 1e3)
    return lat, batch, time.perf_counter() - t0


def run_device_loop(exe, feeds, niter, t_budget, inner: int = 20):
    """Device-only latency: chain `inner` model steps in ONE on-device
    ``lax.fori_loop`` (each iteration's input perturbed by a ~1e-28 scalar
    folded from the previous output — a non-degenerate data dependency XLA
    cannot hoist), so the tunnel/host dispatch cost amortizes over the
    chain.  Each outer call yields one per-step latency sample; the
    percentile block then describes device execution, not the tunnel RTT
    (docs/MEASUREMENTS.md "Tunnel RTT ~25-70 ms per dispatch")."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    compiled = exe._get_compiled()
    fn, weights = compiled._fn, compiled.weights
    prepped = compiled._prep_inputs(feeds)

    @jax.jit
    def chain(weights, inputs):
        def body(i, carry):
            # perturb EVERY input and fold EVERY output into the carry:
            # a single-input/single-output dependency would let XLA hoist
            # sub-graphs fed by the other inputs out of the loop and
            # dead-code-eliminate the other outputs' branches —
            # understating the per-step latency
            ins = {
                k: v + carry.astype(jnp.result_type(v))
                for k, v in inputs.items()
            }
            out = fn(weights, ins)
            acc = jnp.float32(0.0)
            for k in sorted(out):
                acc = acc + out[k].ravel()[0].astype(jnp.float32)
            return acc * 1e-30

        return lax.fori_loop(0, inner, body, jnp.float32(0.0))

    np.asarray(chain(weights, prepped))  # warm-up / compile
    lat, t0 = [], time.perf_counter()
    while len(lat) < niter and time.perf_counter() - t0 < t_budget:
        s = time.perf_counter()
        np.asarray(chain(weights, prepped))  # fetch = completion barrier
        lat.append((time.perf_counter() - s) * 1e3 / inner)
    return lat, inner, time.perf_counter() - t0


def run_async(exe, feeds, niter, t_budget, nireq):
    from pyopenvino_tpu import AsyncInferQueue, CompiledModel

    queue = AsyncInferQueue(CompiledModel(exe), jobs=nireq)
    done = []

    def cb(request, userdata):
        done.append((time.perf_counter() - userdata) * 1e3)

    queue.set_callback(cb)
    queue.start_async(feeds, userdata=time.perf_counter())  # warm-up
    queue.wait_all()
    done.clear()
    t0 = time.perf_counter()
    n = 0
    while n < niter and time.perf_counter() - t0 < t_budget:
        queue.start_async(feeds, userdata=time.perf_counter())
        n += 1
    queue.wait_all()
    return done, 1, time.perf_counter() - t0


def main():
    from pyopenvino_tpu.utils import persistent_compile_cache

    persistent_compile_cache()
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("-m", "--model", required=True,
                    help="family name (mnist, googlenet-v1, ...) or .xml path")
    ap.add_argument("-d", "--device", default="auto",
                    choices=["auto", "cpu", "tpu"])
    ap.add_argument("-hint", "--hint", default="throughput",
                    choices=["latency", "throughput", "none"],
                    help="latency: batch=1 sync; throughput: batched")
    ap.add_argument("-api", "--api", default="sync",
                    choices=["sync", "async"])
    ap.add_argument("-b", "--batch", type=int, default=0,
                    help="batch size (default: 1 latency / 32 throughput)")
    ap.add_argument("-niter", type=int, default=100,
                    help="max iterations (default 100)")
    ap.add_argument("-t", "--time", type=float, default=30.0,
                    help="max seconds of measurement (default 30)")
    ap.add_argument("-nireq", type=int, default=4,
                    help="async infer request slots")
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8w", "int8full", "bf16"])
    ap.add_argument("--backend", default="xla",
                    choices=["interpreter", "xla", "pallas"])
    ap.add_argument("--cache-dir", default=None,
                    help="CACHE_DIR persistent compile cache")
    ap.add_argument("--device-only", action="store_true",
                    help="latency hint: chain steps in one on-device "
                    "fori_loop so the reported latency is device "
                    "execution, not the host/tunnel round trip")
    ap.add_argument("--inner", type=int, default=20,
                    help="steps per on-device chain (--device-only)")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.config import (
        KERNEL_TYPE_TO_BACKEND, QUANT_NAME_TO_MODE, Config, QuantMode,
    )

    ie = IECore()
    if args.cache_dir:
        ie.set_config({"CACHE_DIR": args.cache_dir})
    xml, binp = resolve_model(args.model)
    net = ie.read_network(xml, binp)
    cfg = Config(backend=KERNEL_TYPE_TO_BACKEND[args.backend],
                 quant=QUANT_NAME_TO_MODE[args.quant])
    exe = ie.load_network(net, "TPU", num_requests=args.nireq, config=cfg)

    rng = np.random.default_rng(0)
    if cfg.quant == QuantMode.INT8_FULL:
        exe.set_calibration([random_feeds(net, None, rng) for _ in range(2)])

    batch = args.batch or (32 if args.hint == "throughput" else 1)
    t_load = time.perf_counter()
    if args.api == "async":
        lat, per_iter, wall = run_async(
            exe, random_feeds(net, None, rng), args.niter, args.time,
            args.nireq)
    elif args.device_only:
        # device-only implies the batch=1 single-stream chain regardless
        # of the (default-throughput) hint — silently running a batched
        # throughput loop instead would mislabel the measurement
        batch = 1
        lat, per_iter, wall = run_device_loop(
            exe, random_feeds(net, None, rng), args.niter, args.time,
            args.inner)
    elif args.hint == "throughput" and batch > 1:
        lat, per_iter, wall = run_batched(
            exe, random_feeds(net, batch, rng), args.niter, args.time, batch)
    else:
        lat, per_iter, wall = run_sync(
            exe, random_feeds(net, None, rng), args.niter, args.time)
    exe.close()

    # Duration is the MEASUREMENT window (the denominator of Throughput),
    # like OpenVINO benchmark_app; warm-up/jit-compile time is reported
    # separately (each run_* helper measures `wall` after its warm-up call)
    setup = time.perf_counter() - t_load - wall
    p = percentiles(lat)
    # wall-clock of the measurement window, NOT the latency sum — async
    # latencies overlap (in-flight requests coalesce on device)
    fps = len(lat) * per_iter / wall
    import jax

    print(f"[ INFO ] Device: {jax.devices()[0].platform.upper()} "
          f"(backend={args.backend}, quant={args.quant})")
    print(f"[ INFO ] Model: {xml}")
    print(f"[ INFO ] Mode: api={args.api}, hint={args.hint}, batch={batch}, "
          f"nireq={args.nireq}"
          + (f", device-only (on-device chain, inner={args.inner})"
             if args.device_only and args.api != "async" else ""))
    print(f"Count:        {len(lat)} iterations "
          f"({len(lat) * per_iter} samples)")
    print(f"Setup:        {setup * 1e3:.2f} ms (load + warm-up/compile)")
    print(f"Duration:     {wall * 1e3:.2f} ms")
    print("Latency:")
    for k in ("Median", "Average", "Min", "Max", "P99"):
        print(f"    {k + ':':<9} {p[k]:.2f} ms")
    print(f"Throughput:   {fps:.2f} FPS")


if __name__ == "__main__":
    main()
