"""Interactive MNIST demo — the equivalent of the reference's
draw-and-infer.py (mouse-drawn digit → 28×28 → classify every tick,
reference: draw-and-infer.py:34-76).

Two modes:
  * GUI (default, needs a display): draw with the left mouse button,
    right button clears, ESC quits; scores render as bars with latency
    overlay, like the reference's render loop (draw-and-infer.py:64-76).
  * --selftest (headless): replays canned strokes onto the canvas and
    asserts the classifier responds — used by CI and the integrity run.

Serving path: frames go through the continuous-batching InferenceServer
rather than a blocking per-tick infer, so rapid strokes coalesce.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths

CANVAS = 280  # 10× the 28×28 model input


def build_engine(backend: str):
    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.config import KERNEL_TYPE_TO_BACKEND, Config
    from pyopenvino_tpu.runtime.compiler import compile_model

    ie = IECore()
    xml, binp = _model_paths("mnist")
    net = ie.read_network(xml, binp)
    compiled = compile_model(
        net.model, Config(backend=KERNEL_TYPE_TO_BACKEND[backend])
    )
    return net, compiled


def classify(server, in_name, canvas):
    import cv2

    small = cv2.resize(canvas, (28, 28)).astype(np.float32)
    t0 = time.perf_counter()
    out = server.infer({in_name: small.reshape(1, 1, 28, 28)})
    dt = time.perf_counter() - t0
    scores = next(iter(out.values())).reshape(-1)
    return scores, dt


def selftest(backend: str):
    from pyopenvino_tpu.serving import InferenceServer

    net, compiled = build_engine(backend)
    in_name = net.inputs[0]["name"]
    import cv2

    with InferenceServer(compiled, buckets=(1, 2, 4)) as server:
        canvas = np.zeros((CANVAS, CANVAS), np.uint8)
        # canned "1": a vertical stroke
        cv2.line(canvas, (140, 40), (140, 240), 255, 18)
        scores, dt = classify(server, in_name, canvas)
        digit = int(np.argmax(scores))
        print(f"stroke=vertical-bar predicted={digit} "
              f"latency={dt*1e3:.1f} ms scores={np.round(scores, 3)}")
        assert scores.shape == (10,) and np.all(np.isfinite(scores))
        # clear → new strokes must change the answer distribution
        canvas[:] = 0
        cv2.circle(canvas, (140, 140), 80, 255, 18)
        scores2, _ = classify(server, in_name, canvas)
        assert not np.allclose(scores, scores2)
        print(f"stroke=circle predicted={int(np.argmax(scores2))}")
    print("selftest OK")


def gui(backend: str):
    import cv2

    from pyopenvino_tpu.serving import InferenceServer

    net, compiled = build_engine(backend)
    in_name = net.inputs[0]["name"]
    canvas = np.zeros((CANVAS, CANVAS), np.uint8)
    drawing = {"down": False, "last": None}

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            drawing["down"], drawing["last"] = True, (x, y)
        elif event == cv2.EVENT_LBUTTONUP:
            drawing["down"] = False
        elif event == cv2.EVENT_MOUSEMOVE and drawing["down"]:
            cv2.line(canvas, drawing["last"], (x, y), 255, 18)
            drawing["last"] = (x, y)
        elif event == cv2.EVENT_RBUTTONDOWN:
            canvas[:] = 0

    cv2.namedWindow("draw-and-infer")
    cv2.setMouseCallback("draw-and-infer", on_mouse)
    with InferenceServer(compiled, buckets=(1, 2, 4)) as server:
        while True:
            scores, dt = classify(server, in_name, canvas)
            disp = cv2.cvtColor(canvas, cv2.COLOR_GRAY2BGR)
            for i, s in enumerate(scores):
                h = int(60 * float(s) / (float(scores.max()) + 1e-9))
                cv2.rectangle(disp, (4 + i * 28, CANVAS - 4),
                              (24 + i * 28, CANVAS - 4 - h), (0, 255, 0), -1)
                cv2.putText(disp, str(i), (8 + i * 28, CANVAS - 8),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 0, 255), 1)
            cv2.putText(disp, f"{dt*1e3:.1f} ms", (8, 20),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 0), 1)
            cv2.imshow("draw-and-infer", disp)
            if cv2.waitKey(100) == 27:  # ESC, 100ms tick like the reference
                break
    cv2.destroyAllWindows()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", default="auto",
                    choices=["auto", "cpu", "tpu"],
                    help="cpu pins the process to the CPU backend")
    ap.add_argument("--backend", default="xla",
                    choices=["interpreter", "xla", "pallas"])
    ap.add_argument("--selftest", action="store_true",
                    help="headless canned-stroke check")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)
    if args.selftest or not os.environ.get("DISPLAY"):
        if not args.selftest:
            print("no DISPLAY — running selftest mode")
        selftest(args.backend)
    else:
        gui(args.backend)


if __name__ == "__main__":
    main()
