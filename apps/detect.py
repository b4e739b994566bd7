"""Object detection demo — the headless equivalent of the reference's
detection driver (reference: test_ssd_mobilenet_v1_coco.py).

Three detector families:
  * ssd_mobilenet_v1_coco / shapes_ssd — DetectionOutput models: decodes
    the (1, 1, K, 7) record table [image_id, class_id, confidence,
    xmin, ymin, xmax, ymax] with the -1 image_id terminator (reference:
    DetectionOutput.py:231-258);
  * yolo-tiny — RegionYolo model: host-side YOLO-v2 box decode
    (pyopenvino_tpu/metrics.py decode_region_yolo) with grid/anchors/
    classes read back from the IR's RegionYolo attributes, exactly the
    OMZ demo split of work;
  * yolo-v2 — full YOLO-v2 (ReorgYolo passthrough skip) with the ENTIRE
    box decode + NMS on device (tools/gen_yolo.py append_yolo_decode):
    the model itself emits the DetectionOutput-style record table, zero
    host postprocessing.

Prints every detection above the confidence threshold and optionally
writes an annotated copy of the image (no GUI — the reference calls
cv2.imshow, test_ssd_mobilenet_v1_coco.py:52-55; headless per SURVEY.md
§4 caveat).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", default="auto",
                    choices=["auto", "cpu", "tpu"],
                    help="cpu pins the process to the CPU backend")
    ap.add_argument("--model", default="ssd_mobilenet_v1_coco",
                    choices=["ssd_mobilenet_v1_coco", "yolo-tiny",
                             "shapes_ssd", "yolo-v2"])
    ap.add_argument("--image", default="/root/reference/resources/guinea-pig.jpg")
    ap.add_argument("--backend", default="xla",
                    choices=["interpreter", "xla", "pallas"])
    ap.add_argument("--quant", default="none", choices=["none", "int8w", "int8full"])
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--output", default=None,
                    help="write annotated image here")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    import cv2

    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.config import (
        KERNEL_TYPE_TO_BACKEND, QUANT_NAME_TO_MODE, Config, QuantMode,
    )

    qmode = QUANT_NAME_TO_MODE[args.quant]
    cfg = Config(
        backend=KERNEL_TYPE_TO_BACKEND[args.backend],
        quant=qmode,
    )
    ie = IECore()
    if args.model == "shapes_ssd":
        from tools.train_real import trained_model_paths

        xml, binp = trained_model_paths("shapes_ssd")
    else:
        xml, binp = _model_paths(args.model)
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU", config=cfg)

    in_name = net.inputs[0]["name"]
    _, c, h, w = net.inputs[0]["shape"]

    img = cv2.imread(args.image)
    if img is None:
        raise FileNotFoundError(args.image)
    blob = (
        cv2.resize(img, (w, h)).transpose(2, 0, 1)
        .reshape(1, c, h, w).astype(np.float32)
    )

    if qmode == QuantMode.INT8_FULL:
        # representative calibration: the input plus one noise sample;
        # dense anchor-score tails clip best at the 99.9th percentile
        # (docs/MEASUREMENTS.md Accuracy)
        from tools.accuracy import CAL_PERCENTILE

        rng = np.random.default_rng(1)
        pct = CAL_PERCENTILE.get(args.model)
        if pct is not None:
            exe.config = cfg.replace(calibration_percentile=pct)
        exe.set_calibration([
            {in_name: blob},
            {in_name: rng.uniform(0, 255, blob.shape).astype(np.float32)},
        ])

    out = exe.infer({in_name: blob})  # warm-up/compile
    t0 = time.perf_counter()
    out = exe.infer({in_name: blob})
    dt = time.perf_counter() - t0
    print(f"{dt*1e3:.2f} ms/inf ({args.backend}/{args.quant})")

    ih, iw = img.shape[:2]
    if args.model == "yolo-tiny":
        # RegionYolo model: host-side YOLO-v2 decode, params from the IR
        from pyopenvino_tpu.ir import attrs as A
        from pyopenvino_tpu.metrics import decode_region_yolo

        ry = next(n for n in net.model.nodes.values()
                  if n.op_type == "RegionYolo")
        flat_anchors = A.get_float_tuple(ry.attrs, "anchors")
        anchors = list(zip(flat_anchors[::2], flat_anchors[1::2]))
        classes = A.get_int(ry.attrs, "classes")
        grid = ry.inputs[0].shape[2:]
        dets = decode_region_yolo(
            next(iter(out.values())), grid, anchors, classes,
            conf_threshold=args.threshold)
        for cls, conf, (x0, y0, x1, y1) in dets:
            box = (int(x0 * iw), int(y0 * ih), int(x1 * iw), int(y1 * ih))
            print(f"  class={cls} conf={conf:.4f} box={box}")
            if args.output:
                cv2.rectangle(img, box[:2], box[2:], (0, 255, 0), 2)
        print(f"{len(dets)} detections >= {args.threshold}")
        if args.output:
            cv2.imwrite(args.output, img)
        return

    records = next(iter(out.values())).reshape(-1, 7)
    count = 0
    for rec in records:
        image_id, class_id, conf, x0, y0, x1, y1 = rec
        if image_id == -1:  # terminator (reference: DetectionOutput.py:246)
            break
        if conf < args.threshold:
            continue
        count += 1
        box = (int(x0 * iw), int(y0 * ih), int(x1 * iw), int(y1 * ih))
        print(f"  class={int(class_id)} conf={conf:.4f} box={box}")
        if args.output:
            cv2.rectangle(img, box[:2], box[2:], (0, 255, 0), 2)
            cv2.putText(img, f"{int(class_id)}:{conf:.2f}",
                        (box[0], max(12, box[1] - 4)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    print(f"{count} detections >= {args.threshold}")
    if args.output:
        cv2.imwrite(args.output, img)
        print("wrote", args.output)


if __name__ == "__main__":
    main()
