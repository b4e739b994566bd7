"""Scaling report — measures data-parallel scaling efficiency over a device
mesh and emits the BASELINE.md report points (1 chip / 1 host / N hosts).

The reference is strictly single-device (SURVEY.md §2.4), so there is no
reference analogue; targets come from BASELINE.json (≥90% of linear scaling
to ≥2 hosts, batch-sharded DP).

On real multi-chip hardware this measures true ICI-sharded throughput; with
one chip (or on CPU) it uses N virtual host devices — the numbers then
validate the *sharding machinery and its overhead*, not chip performance
(virtual devices share the same silicon, so "efficiency" reflects
partitioning overhead only).  Either way the identical code path —
jax.sharding Mesh + NamedSharding(P('data')) via parallel/mesh.py — is what
runs on a pod slice after jax.distributed.initialize().

Usage:
    python apps/scaling_report.py --devices 8 --model mnist --batch-per 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths


def measure(compiled, in_name, shape, batch, iters=10):
    import jax

    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (batch,) + shape).astype(np.float32)
    fn = compiled.batched_fn(batch)
    dev = jax.device_put({in_name: blob})
    out = fn(compiled.weights, dev)
    k = next(iter(out))
    idx = (0,) * out[k].ndim  # .ndim needs no device->host transfer
    _ = np.asarray(out[k][idx])  # warm-up barrier (host fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(compiled.weights, dev)
    _ = np.asarray(out[k][idx])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def run_multiprocess(args):
    """Spawn real jax.distributed processes (tools/mp_worker.py) for 1 and
    N process groups and report throughput scaling across the process
    boundary."""
    import re
    import socket
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    # single-process reference outputs for correctness checking in workers
    from pyopenvino_tpu.utils import force_cpu

    force_cpu()
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = _model_paths(args.model)
    model = read_ir_model(xml, binp)
    compiled = compile_model(model, Config())
    param = model.parameters[0]
    shape = param.outputs[param.out_port].shape

    results = {}
    for nproc in (1, args.multiprocess):
        batch = args.batch_per * nproc
        rng = np.random.default_rng(0)
        blob = rng.uniform(0, 255, (batch,) + shape).astype(np.float32)
        ref = compiled.infer_batch({param.name: blob})
        ref_npz = f"/tmp/scaling_ref_{nproc}.npz"
        np.savez(ref_npz, **ref)

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        # Pin each worker to a disjoint core set: every process emulates a
        # HOST, and two XLA:CPU thread pools oversubscribing one box's
        # cores measures contention, not scaling (measured on the 4-core
        # rig: unpinned 2-process = 36% of linear, pinned = ~100%).
        import shutil
        ncores = os.cpu_count() or 1
        use_taskset = shutil.which("taskset") and ncores >= nproc

        def cmd(pid):
            base = [sys.executable, "tools/mp_worker.py", str(pid),
                    str(nproc), str(port), args.model, str(args.batch_per),
                    ref_npz, "--bench", "10"]
            mode = getattr(args, "mp_mode", "dp")
            if mode in ("dp_tp", "ep") and nproc > 1:
                base.append("--tp")
            if mode == "pp" and nproc > 1:
                base.append("--pipeline")
            if not use_taskset:
                return base
            lo = pid * ncores // nproc
            hi = (pid + 1) * ncores // nproc - 1
            return ["taskset", "-c", f"{lo}-{hi}"] + base

        procs = [
            subprocess.Popen(
                cmd(pid), cwd=root, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(nproc)
        ]
        tputs = []
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=600)
            if p.returncode != 0:
                print(out)
                raise SystemExit(f"worker {pid} failed")
            m = re.search(r"MP_THROUGHPUT \d+ ([\d.]+)", out)
            tputs.append(float(m.group(1)))
        results[nproc] = min(tputs)  # collective rate, gated by slowest
        print(f"processes={nproc:<3} global_batch={batch:<5} "
              f"{results[nproc]:>10.1f} img/s")

    base, multi = results[1], results[args.multiprocess]
    eff = multi / (base * args.multiprocess)
    print(json.dumps({
        "model": args.model,
        "mode": f"multiprocess-{getattr(args, 'mp_mode', 'dp')}",
        "processes": args.multiprocess, "img_s": round(multi, 1),
        "efficiency_vs_linear": round(eff, 3),
    }))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8,
                    help="mesh sizes 1..N (powers of two) are measured")
    ap.add_argument("--model", default="mnist",
                    choices=["mnist", "mnist_bn", "googlenet-v1",
                             "ssd_mobilenet_v1_coco", "resnet18",
                             "mobilenet-v2", "shufflenet-v2",
                             "efficientnet-b0", "squeezenet-1.1",
                             "unet", "vit-tiny", "moe-mlp", "lstm-tiny",
                             "resnet18-pot"])
    ap.add_argument("--batch-per", type=int, default=16,
                    help="per-device batch (weak scaling)")
    ap.add_argument("--quant", default="none", choices=["none", "int8w"])
    ap.add_argument("--tensor-parallel", action="store_true",
                    help="add a model=2 TP axis where divisible")
    ap.add_argument("--spatial", action="store_true",
                    help="add a spatial=2 SP axis (image-row halo-exchange "
                    "sharding) where divisible; incompatible with "
                    "--tensor-parallel (the SPMD partitioner miscompiles "
                    "TP x SP — docs/MEASUREMENTS.md)")
    ap.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"],
                    help="auto: virtual CPU mesh when measuring >1 device "
                    "(this rig has one chip); tpu: use real devices as-is "
                    "(pod slices)")
    ap.add_argument("--pipeline", type=int, default=0, metavar="K",
                    help="measure the SPMD GPipe pipeline at K stages "
                    "(parallel/pipeline.py) instead of the DP/TP sweep; "
                    "remaining devices form the 'data' axis")
    ap.add_argument("--multiprocess", type=int, default=0, metavar="N",
                    help="spawn N real OS processes forming a "
                    "jax.distributed group (CPU/gloo, 2 devices each) and "
                    "report collective DP throughput + scaling vs one "
                    "process — the multi-host report point of BASELINE.md "
                    "exercised across actual process boundaries")
    ap.add_argument("--mp-mode", default="dp",
                    choices=["dp", "dp_tp", "pp", "ep"],
                    help="--multiprocess strategy: dp (batch over the "
                    "process boundary), dp_tp (TP inside each process), "
                    "pp (pipeline STAGES across the boundary, activations "
                    "ride ppermute), ep (expert axis over 'model' — use "
                    "with --model moe-mlp)")
    args = ap.parse_args()
    if args.mp_mode == "ep" and args.model != "moe-mlp":
        ap.error("--mp-mode ep needs --model moe-mlp (the expert-"
                 "parallel family)")

    if args.multiprocess:
        return run_multiprocess(args)

    # Decide platform BEFORE the first jax backend use — device counts are
    # frozen at initialization.
    if args.device == "cpu" or (args.device == "auto" and args.devices > 1):
        from pyopenvino_tpu.utils import force_cpu

        force_cpu(args.devices)

    import jax

    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_compiled,
    )
    from pyopenvino_tpu.runtime.compiler import compile_model

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    print(f"platform={platform} devices={n_dev}")

    xml, binp = _model_paths(args.model)
    model = read_ir_model(xml, binp)
    param = model.parameters[0]
    in_name = param.name
    shape = param.outputs[param.out_port].shape

    cfg = Config(
        quant=QuantMode.INT8_WEIGHT if args.quant == "int8w" else QuantMode.NONE
    )

    if args.pipeline:
        from pyopenvino_tpu.parallel.pipeline import (
            build_pipeline_mesh, compile_pipelined,
        )

        K = args.pipeline
        data_ax = max(1, min(args.devices, n_dev) // K)
        base = measure(compile_model(model, cfg), in_name, shape,
                       args.batch_per)
        pp = compile_pipelined(model, build_pipeline_mesh(K, data=data_ax),
                               cfg)
        batch = args.batch_per * data_ax * K
        rng = np.random.default_rng(0)
        blob = rng.uniform(0, 255, (batch,) + shape).astype(np.float32)
        out = pp.infer_batch({in_name: blob})  # warm (compiles)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = pp.infer_batch({in_name: blob})
        k = next(iter(out))
        _ = np.asarray(out[k]).ravel()[:1]
        img_s = batch / ((time.perf_counter() - t0) / iters)
        eff = img_s / (base * data_ax * K)
        print(f"pipeline stages={K} data={data_ax} batch={batch} "
              f"{img_s:>10.1f} img/s  efficiency={eff:.2%}")
        print(json.dumps({
            "model": args.model, "platform": platform, "quant": args.quant,
            "mode": "pipeline", "stages": K, "data": data_ax,
            "img_s": round(img_s, 1), "efficiency_vs_linear": round(eff, 3),
            "note": ("virtual devices share one chip; efficiency measures "
                     "schedule+partitioning overhead (incl. the (K-1)/"
                     "(n_micro+K-1) pipeline bubble), not hardware scaling"
                     if platform == "cpu" or n_dev == 1 else
                     "real multi-device scaling"),
        }))
        return

    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= min(args.devices, n_dev)]
    rows = []
    base = None
    if args.tensor_parallel and args.spatial:
        raise SystemExit("--tensor-parallel and --spatial cannot combine "
                         "(SPMD partitioner miscompilation — MEASUREMENTS)")
    for d in sizes:
        compiled = compile_model(model, cfg)
        if d > 1:
            model_ax = 2 if args.tensor_parallel and d % 2 == 0 else 1
            sp_ax = 2 if args.spatial and (d // model_ax) % 2 == 0 else 1
            mesh = build_mesh(MeshConfig(
                data=d // model_ax // sp_ax, model=model_ax, spatial=sp_ax
            ))
            shard_compiled(compiled, mesh,
                           tensor_parallel=args.tensor_parallel,
                           spatial_parallel=args.spatial)
        img_s = measure(compiled, in_name, shape, args.batch_per * d)
        if base is None:
            base = img_s
        eff = img_s / (base * d)
        rows.append({"devices": d, "img_s": round(img_s, 1),
                     "efficiency": round(eff, 3)})
        print(f"devices={d:<3} batch={args.batch_per * d:<5} "
              f"{img_s:>10.1f} img/s  efficiency={eff:.2%}")

    print(json.dumps({
        "model": args.model, "platform": platform, "quant": args.quant,
        "weak_scaling": rows,
        "note": ("virtual devices share one chip; efficiency measures "
                 "sharding overhead, not hardware scaling"
                 if platform == "cpu" or n_dev == 1 else
                 "real multi-device scaling"),
    }))


if __name__ == "__main__":
    main()
