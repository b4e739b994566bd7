"""Model inspector — summarize an IR model and its compiled form.

Prints the op histogram, parameter/const footprint, per-op-type FLOPs
(from shape inference), constant-folded/fused node counts and the XLA cost
analysis — the offline counterpart of the reference's dump_graph debug
helper (reference: common_def.py:116-122), at framework scale.

Usage:
    python tools/inspect.py --model googlenet-v1 [--backend pallas]
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths


def conv_flops(model, analysis):
    """MACs×2 per conv/matmul node from inferred shapes."""
    flops = Counter()
    for node in model:
        try:
            out_shape = analysis.shape(node.id, node.out_port)
        except Exception:  # noqa: BLE001 — Result nodes etc.
            continue
        if node.op_type in ("Convolution", "GroupConvolution"):
            w_shape = analysis.shape(*model.in_edges[node.id][1])
            k = int(np.prod(w_shape[1:])) if node.op_type == "Convolution" \
                else int(np.prod(w_shape[2:]))
            flops[node.op_type] += 2 * int(np.prod(out_shape)) * k
        elif node.op_type == "MatMul":
            a_shape = analysis.shape(*model.in_edges[node.id][0])
            flops[node.op_type] += 2 * int(np.prod(out_shape)) * a_shape[-1]
    return flops


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="googlenet-v1",
                    choices=["mnist", "mnist_bn", "googlenet-v1",
                             "ssd_mobilenet_v1_coco", "resnet18",
                             "mobilenet-v2", "shufflenet-v2",
                             "efficientnet-b0", "squeezenet-1.1",
                             "unet", "vit-tiny", "moe-mlp", "lstm-tiny",
                             "resnet18-pot"])
    ap.add_argument("--backend", default="xla",
                    choices=["interpreter", "xla", "pallas"])
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8w", "int8full"])
    ap.add_argument("--device", default="cpu",
                    choices=["cpu", "auto", "tpu"])
    ap.add_argument("--profile", action="store_true",
                    help="run one device execution under jax.profiler and "
                    "print MEASURED per-op-category and per-node cost "
                    "(device time, bound-by) — runtime/profiling.py")
    ap.add_argument("--batch", type=int, default=None,
                    help="profile at this batch size (default: single)")
    ap.add_argument("--pipeline", type=int, default=0, metavar="K",
                    help="show the K-stage pipeline partition (cut tensors, "
                    "per-stage FLOP share — parallel/pipeline.py)")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    from pyopenvino_tpu.config import (
        KERNEL_TYPE_TO_BACKEND, Config, QuantMode,
    )
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = _model_paths(args.model)
    model = read_ir_model(xml, binp)

    print(f"== {model.name} ==")
    hist = Counter(n.op_type for n in model)
    print(f"{len(model.nodes)} nodes, {len(model.edges)} edges")
    for op, cnt in hist.most_common():
        print(f"  {op:<22} {cnt}")

    n_params = sum(
        n.const.size for n in model.find_by_type("Const") if n.const is not None
    )
    print(f"const elements: {n_params:,}")

    from pyopenvino_tpu.config import QUANT_NAME_TO_MODE

    cfg = Config(
        backend=KERNEL_TYPE_TO_BACKEND[args.backend],
        quant=QUANT_NAME_TO_MODE[args.quant],
    )
    cal = None
    if cfg.quant == QuantMode.INT8_FULL:
        # the stats below must describe the ACTUAL int8full program
        # (its argument/temp bytes are the numbers the mode exists to
        # halve), so calibrate on synthetic samples here too
        rng0 = np.random.default_rng(1)
        cal = [
            {
                p.name: rng0.uniform(
                    0, 255, p.outputs[p.out_port].shape
                ).astype(np.float32)
                for p in model.parameters
            }
            for _ in range(2)
        ]
    c = compile_model(model, cfg, calibration_samples=cal)
    print(f"\ncompiled ({args.backend}/{args.quant}):")
    print(f"  graph rewrites: {len(model.nodes) - len(c.model.nodes)} nodes "
          f"removed by scale folding")
    print(f"  constant-folded runtime nodes: {len(c._folded_nodes)}")
    print(f"  fused epilogue groups: {len(c._fusions)} "
          f"(absorbing {len(c._fused_skip)} nodes)")
    print(f"  weight pytree entries: {len(c.weights)}")

    fl = conv_flops(c.model, c.analysis)
    total = sum(fl.values())
    print(f"  FLOPs/inference: {total/1e9:.3f} G "
          f"({ {k: round(v/1e9, 3) for k, v in fl.items()} })")

    if args.pipeline:
        from pyopenvino_tpu.parallel.pipeline import (
            _node_cost, choose_cuts, find_cut_candidates, partition,
        )

        rt, cands = find_cut_candidates(c.model, c.analysis)
        print(f"\npipeline partition ({args.pipeline} stages, "
              f"{len(cands)} candidate cut points):")
        rt2, cuts = choose_cuts(c.model, c.analysis, args.pipeline)
        specs = partition(c.model, rt2, cuts)
        all_cost = sum(
            _node_cost(c.model, c.analysis, c.model.nodes[nid])
            for nid in rt2
        ) or 1.0
        bounds = [-1] + [cut.pos for cut in cuts] + [len(rt2) - 1]
        for s, spec in enumerate(specs):
            seg = rt2[bounds[s] + 1: bounds[s + 1] + 1]
            cost = sum(
                _node_cost(c.model, c.analysis, c.model.nodes[nid])
                for nid in seg
            )
            cut_desc = ""
            if s < len(cuts):
                cut = cuts[s]
                node = c.model.nodes[cut.node_id]
                shape = node.outputs[cut.port].shape
                cut_desc = (f" → cut at {node.op_type} {node.name!r} "
                            f"{shape} ({cut.size:,} elems)")
            print(f"  stage {s}: {len(seg)} ops, "
                  f"{100 * cost / all_cost:5.1f}% of FLOPs{cut_desc}")

    try:
        ca = c.cost_analysis()
        print(f"  XLA cost model: flops={ca.get('flops', 0):,.0f} "
              f"bytes={ca.get('bytes accessed', 0):,.0f}")
    except Exception as e:  # noqa: BLE001
        print(f"  cost analysis unavailable: {e}")

    try:
        ma = c.memory_analysis()
        mb = 1024 * 1024
        print(
            "  device memory: "
            f"args={ma.get('argument_size_in_bytes', 0)/mb:,.1f} MiB "
            f"temp={ma.get('temp_size_in_bytes', 0)/mb:,.1f} MiB "
            f"out={ma.get('output_size_in_bytes', 0)/mb:,.1f} MiB "
            f"code={ma.get('generated_code_size_in_bytes', 0)/mb:,.1f} MiB"
        )
    except Exception as e:  # noqa: BLE001
        print(f"  memory analysis unavailable: {e}")

    if args.profile:
        from pyopenvino_tpu.runtime import profiling

        # `c` was already compiled with the requested quant mode (incl.
        # int8full calibration) above — profile that same program

        rng = np.random.default_rng(0)
        if args.batch:
            inputs = {
                p.name: rng.uniform(
                    0, 255,
                    (args.batch,) + tuple(p.outputs[p.out_port].shape),
                ).astype(np.float32)
                for p in c.model.parameters
            }
        else:
            inputs = {
                p.name: rng.uniform(
                    0, 255, p.outputs[p.out_port].shape
                ).astype(np.float32)
                for p in c.model.parameters
            }
        rows = c.profile(inputs, batch_size=args.batch)
        if not rows:
            print("\nprofile: no hlo_stats rows (backend/profiler "
                  "unavailable)")
            return
        print(f"\nmeasured per-op-category cost "
              f"(batch={args.batch or 1}):")
        print(profiling.format_table(profiling.aggregate(rows, "category")))
        print("\ntop nodes by measured self time:")
        agg = profiling.aggregate(rows, "node")[:15]
        print(profiling.format_table(agg, "node"))


if __name__ == "__main__":
    main()
