"""Image classification demo — covers the reference's MNIST and GoogLeNet
drivers (reference: test_pyopenvino.py, test_googlenet_v1.py) as one headless
CLI.

Usage:
    python apps/classify.py --model mnist [--image resources/mnist2.png]
    python apps/classify.py --model googlenet-v1 --image guinea-pig.jpg \
        --backend pallas --quant int8w --batch 32

Preprocessing matches the reference exactly: raw 0-255 BGR pixels, NCHW,
no mean subtraction (the 1/255 scale is folded into the first conv by the
model conversion — reference: convert-model.sh:8-13, test_googlenet_v1.py:20-27).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths

DEFAULT_IMAGES = {
    "mnist": "/root/reference/resources/mnist2.png",
    "mnist_bn": "/root/reference/resources/mnist2.png",
    "googlenet-v1": "/root/reference/resources/guinea-pig.jpg",
    "resnet18": "/root/reference/resources/guinea-pig.jpg",
    "mobilenet-v2": "/root/reference/resources/guinea-pig.jpg",
    "shufflenet-v2": "/root/reference/resources/guinea-pig.jpg",
    "efficientnet-b0": "/root/reference/resources/guinea-pig.jpg",
    "squeezenet-1.1": "/root/reference/resources/guinea-pig.jpg",
    "vit-tiny": "/root/reference/resources/guinea-pig.jpg",
    "moe-mlp": "/root/reference/resources/guinea-pig.jpg",
    "resnet18-pot": "/root/reference/resources/guinea-pig.jpg",
    "lstm-tiny": None,  # feature-matrix input: seeded random blob
}


def load_blob(model_name: str, image_path: str, shape):
    import cv2

    if image_path is None:  # non-image input (lstm-tiny feature matrix)
        rng = np.random.default_rng(0)
        return rng.uniform(0, 255, tuple(shape)).astype(np.float32)
    img = cv2.imread(image_path)
    if img is None:
        raise FileNotFoundError(image_path)
    n, c, h, w = shape
    img = cv2.resize(img, (w, h))
    if c == 1:
        img = cv2.split(img)[0]
        return img.reshape(1, 1, h, w).astype(np.float32)
    # BGR, NCHW, raw 0-255 (reference: test_googlenet_v1.py:20-27)
    return img.transpose(2, 0, 1).reshape(1, c, h, w).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", default="auto",
                    choices=["auto", "cpu", "tpu"],
                    help="cpu pins the process to the CPU backend")
    ap.add_argument("--model", default="mnist",
                    choices=["mnist", "mnist_bn", "googlenet-v1", "resnet18",
                             "mobilenet-v2", "shufflenet-v2",
                             "efficientnet-b0", "squeezenet-1.1",
                             "vit-tiny", "moe-mlp", "resnet18-pot",
                             "lstm-tiny"])
    ap.add_argument("--image", default=None)
    ap.add_argument("--backend", default="xla",
                    choices=["interpreter", "xla", "pallas"])
    ap.add_argument("--quant", default="none", choices=["none", "int8w", "int8full"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=1,
                    help="repeat the image to time batched throughput")
    ap.add_argument("--stream", type=int, default=0, metavar="N",
                    help="stream N raw-image batches through the native "
                    "AsyncLoader (background C++ preprocessing overlapping "
                    "device inference) and report end-to-end img/s vs the "
                    "synchronous pipeline; requires --batch > 1")
    ap.add_argument("--u8", action="store_true",
                    help="u8 ingress: PrePostProcessor bakes the u8->f32 "
                    "cast on-device and the loader keeps blobs uint8 "
                    "(1 byte/px host->device — the headline methodology, "
                    "bench.py)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--verbose", action="store_true",
                    help="per-layer timing (interpreter backend)")
    args = ap.parse_args()
    if args.stream and args.batch <= 1:
        ap.error("--stream needs --batch > 1 (it streams image batches)")

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.config import (
        KERNEL_TYPE_TO_BACKEND, QUANT_NAME_TO_MODE, Config, QuantMode,
    )

    qmode = QUANT_NAME_TO_MODE[args.quant]
    cfg = Config(
        backend=KERNEL_TYPE_TO_BACKEND[args.backend],
        quant=qmode,
        compute_dtype=args.dtype,
    )

    ie = IECore()
    xml, binp = _model_paths(args.model)
    net = ie.read_network(xml, binp)
    if args.u8:
        from pyopenvino_tpu.preprocess import PrePostProcessor

        ppp = PrePostProcessor(net)
        ppp.input().tensor().set_element_type("u8")
        net = ppp.build()
    exe = ie.load_network(net, "TPU", config=cfg)

    in_name = net.inputs[0]["name"]
    shape = net.inputs[0]["shape"]
    image = args.image or DEFAULT_IMAGES[args.model]
    blob = load_blob(args.model, image, shape)

    if qmode == QuantMode.INT8_FULL:
        # calibrate on the actual input plus one noise sample (calibration
        # must see representative data — docs/MEASUREMENTS.md Accuracy)
        rng = np.random.default_rng(1)
        exe.set_calibration([
            {in_name: blob},
            {in_name: rng.uniform(0, 255, tuple(shape)).astype(np.float32)},
        ])

    if args.batch > 1:
        # build the batch through the native data-loading pipeline
        # (pyopenvino_tpu/native: threaded resize + NCHW conversion)
        from pyopenvino_tpu import native

        import cv2

        if image is None:  # non-image input: replicate the seeded blob
            batch = np.repeat(blob[None], args.batch, axis=0)
            out = exe.infer_batch({in_name: batch})
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = exe.infer_batch({in_name: batch})
            k = next(iter(out))
            np.asarray(out[k]).ravel()[:1]
            dt = (time.perf_counter() - t0) / args.iters
            print(f"batched: {args.batch / dt:.1f} samples/s "
                  f"(batch={args.batch}, {dt * 1e3:.2f} ms/iter)")
            return
        raw = cv2.imread(image)
        n, c, h, w = shape
        if c == 1:
            raw = cv2.split(raw)[0][..., None]
        imgs = np.repeat(raw[None], args.batch, axis=0)
        batch = native.preprocess_batch(imgs, (h, w), u8_out=args.u8).reshape(
            (args.batch,) + tuple(shape)
        )
        out = exe.infer_batch({in_name: batch})  # warm-up/compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = exe.infer_batch({in_name: batch})
        k = next(iter(out))
        _ = np.asarray(out[k][0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"batch={args.batch}: {dt*1e3:.2f} ms/batch "
              f"= {args.batch/dt:.1f} img/s")
        scores = out[k][0].reshape(-1)

        if args.stream:
            import threading

            ih, iw, ic = raw.shape
            # synchronous pipeline: preprocess then infer, serialized
            t0 = time.perf_counter()
            for _ in range(args.stream):
                bb = native.preprocess_batch(
                    imgs, (h, w), u8_out=args.u8
                ).reshape((args.batch,) + tuple(shape))
                out = exe.infer_batch({in_name: bb})
            _ = np.asarray(out[k][0, 0])
            sync_s = time.perf_counter() - t0
            # streamed: AsyncLoader prefetches in background C++ threads
            with native.AsyncLoader((ih, iw, ic), (h, w),
                                    depth=4, u8_out=args.u8) as loader:
                def produce():
                    for _ in range(args.stream):
                        loader.submit(imgs)
                    loader.close()
                th = threading.Thread(target=produce)
                th.start()
                t0 = time.perf_counter()
                for bb in loader:
                    out = exe.infer_batch(
                        {in_name: bb.reshape((args.batch,) + tuple(shape))})
                _ = np.asarray(out[k][0, 0])
                stream_s = time.perf_counter() - t0
                th.join()
            n_img = args.stream * args.batch
            print(f"stream={args.stream} batches: sync "
                  f"{n_img/sync_s:.1f} img/s, AsyncLoader "
                  f"{n_img/stream_s:.1f} img/s "
                  f"({sync_s/stream_s:.2f}x)")
    else:
        out = exe.infer({in_name: blob}, verbose=args.verbose)  # warm-up
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = exe.infer({in_name: blob})
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{dt*1e3:.2f} ms/inf = {1/dt:.1f} img/s "
              f"({args.backend}/{args.quant})")
        scores = next(iter(out.values())).reshape(-1)

    top5 = np.argsort(scores)[::-1][:5]
    print("top-5:", [(int(i), float(scores[i])) for i in top5])


if __name__ == "__main__":
    main()
