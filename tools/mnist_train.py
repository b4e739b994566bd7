"""Train the MNIST CNN in JAX and export it as OpenVINO IR — the
framework-native equivalent of the reference's training + conversion
pipeline (reference: mnist-tf-training.py trains the topology in TF/Keras;
convert-model.sh runs Model Optimizer with `--scale 255`, folding input
scaling into the first conv).

Topology matches mnist-tf-training.py:25-34:
    Conv(32,3x3) ReLU → MaxPool2 → Conv(64,3x3) ReLU → MaxPool2 →
    Conv(64,3x3) ReLU → Flatten → Dense(64) ReLU → Dense(10) SoftMax

This environment has no network access, so the dataset is procedurally
rendered digits (cv2 Hershey fonts × shear/rotation/elastic/thickness/noise
augmentation).  Font-rendered digits are NOT handwritten MNIST — the
resulting classifier reaches ~95-97% on its own distribution but can
misread genuinely handwritten strokes (mnist2.png's loopy "2" lands on
"1"); shipping real MNIST data would fix that, the pipeline doesn't change.
The point being exercised is the full framework loop: train (JAX) →
fold input scale into conv1 (like `--scale 255`) → build graph
(ir/builder.py) → serialize (ir/writer.py) → reload through IECore with
bit-level parity against the JAX forward (~1e-8 max prob diff).

Usage: python tools/mnist_train.py [--steps 1200] [--out assets/mnist_trained]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# -- synthetic data ----------------------------------------------------------

FONTS = None


def _fonts():
    import cv2

    global FONTS
    if FONTS is None:
        FONTS = [
            cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_DUPLEX,
            cv2.FONT_HERSHEY_COMPLEX, cv2.FONT_HERSHEY_TRIPLEX,
            cv2.FONT_HERSHEY_PLAIN, cv2.FONT_HERSHEY_COMPLEX_SMALL,
            cv2.FONT_HERSHEY_SCRIPT_SIMPLEX, cv2.FONT_HERSHEY_SCRIPT_COMPLEX,
        ]
    return FONTS


def render_digit(rng: np.random.Generator, digit: int) -> np.ndarray:
    """One 28×28 grayscale digit image, values 0-255 (white on black,
    MNIST polarity)."""
    import cv2

    canvas = np.zeros((64, 64), np.uint8)
    # bias toward the script (handwriting-like) fonts
    fonts = _fonts()
    font = fonts[rng.integers(len(fonts))] if rng.random() < 0.5 else \
        fonts[6 + rng.integers(2)]
    scale = float(rng.uniform(1.4, 2.4))
    thick = int(rng.integers(2, 5))
    (tw, th), _ = cv2.getTextSize(str(digit), font, scale, thick)
    x = int((64 - tw) / 2 + rng.integers(-5, 6))
    y = int((64 + th) / 2 + rng.integers(-5, 6))
    cv2.putText(canvas, str(digit), (x, y), font, scale, 255, thick,
                cv2.LINE_AA)
    # rotation + shear (handwriting slant)
    angle = float(rng.uniform(-12, 12))
    m = cv2.getRotationMatrix2D((32, 32), angle, 1.0)
    m[0, 1] += float(rng.uniform(-0.18, 0.18))  # x-shear
    canvas = cv2.warpAffine(canvas, m, (64, 64))
    # elastic deformation (coarse random displacement field)
    grid = rng.normal(0, 1, (2, 4, 4)).astype(np.float32)
    alpha = float(rng.uniform(1.0, 4.0))
    dx = cv2.resize(grid[0], (64, 64), interpolation=cv2.INTER_CUBIC) * alpha
    dy = cv2.resize(grid[1], (64, 64), interpolation=cv2.INTER_CUBIC) * alpha
    xs, ys = np.meshgrid(np.arange(64, dtype=np.float32),
                         np.arange(64, dtype=np.float32))
    canvas = cv2.remap(canvas, xs + dx, ys + dy, cv2.INTER_LINEAR)
    # stroke-width variation (pen thickness)
    k = int(rng.integers(0, 3))
    if k:
        kernel = np.ones((k + 1, k + 1), np.uint8)
        canvas = (cv2.dilate(canvas, kernel) if rng.random() < 0.5
                  else cv2.erode(canvas, kernel))
    # aspect-ratio squeeze (handwritten digits vary width/height)
    aw = float(rng.uniform(0.7, 1.15))
    ah = float(rng.uniform(0.85, 1.1))
    canvas = cv2.resize(canvas, (int(64 * aw), int(64 * ah)))
    pad_w = max(0, 64 - canvas.shape[1]); pad_h = max(0, 64 - canvas.shape[0])
    canvas = cv2.copyMakeBorder(canvas, pad_h // 2, pad_h - pad_h // 2,
                                pad_w // 2, pad_w - pad_w // 2,
                                cv2.BORDER_CONSTANT)[:64, :64]
    img = cv2.resize(canvas, (28, 28), interpolation=cv2.INTER_AREA)
    noise = rng.normal(0, 8, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255)


def make_dataset(n_per_class: int, seed: int):
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for digit in range(10):
        for _ in range(n_per_class):
            xs.append(render_digit(rng, digit))
            ys.append(digit)
    x = np.stack(xs)[:, None, :, :] / 255.0  # (N, 1, 28, 28) in [0, 1]
    y = np.asarray(ys, np.int32)
    perm = rng.permutation(len(y))
    return x[perm].astype(np.float32), y[perm]


# -- model (NCHW, matching the exported graph semantics exactly) -------------

def init_params(rng: np.random.Generator):
    def he(shape, fan_in):
        return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(
            np.float32
        )

    return {
        "w1": he((32, 1, 3, 3), 9), "b1": np.zeros(32, np.float32),
        "w2": he((64, 32, 3, 3), 288), "b2": np.zeros(64, np.float32),
        "w3": he((64, 64, 3, 3), 576), "b3": np.zeros(64, np.float32),
        "w4": he((576, 64), 576), "b4": np.zeros(64, np.float32),
        "w5": he((64, 10), 64), "b5": np.zeros(10, np.float32),
    }


def forward(params, x):
    """x: (N, 1, 28, 28) in [0,1] → logits (N, 10).  Identical math to the
    exported IR graph (conv valid/stride1, 2×2 floor pools, NCHW flatten)."""
    import jax.numpy as jnp
    from jax import lax

    def conv(x, w, b):
        out = lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jnp.maximum(out + b.reshape(1, -1, 1, 1), 0)

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )

    x = pool(conv(x, params["w1"], params["b1"]))      # (N,32,13,13)
    x = pool(conv(x, params["w2"], params["b2"]))      # (N,64,5,5)
    x = conv(x, params["w3"], params["b3"])            # (N,64,3,3)
    x = x.reshape(x.shape[0], -1)                      # NCHW flatten → 576
    x = jnp.maximum(x @ params["w4"] + params["b4"], 0)
    return x @ params["w5"] + params["b5"]


def train(steps: int, batch: int, seed: int):
    import jax
    import jax.numpy as jnp
    import optax

    x, y = make_dataset(1500, seed)
    n_val = 1000
    xv, yv = x[:n_val], y[:n_val]
    xt, yt = x[n_val:], y[n_val:]

    params = init_params(np.random.default_rng(seed))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = forward(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, xb, yb):
        return (forward(params, xb).argmax(-1) == yb).mean()

    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        idx = rng.integers(0, len(yt), batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(xt[idx]), jnp.asarray(yt[idx])
        )
        if (i + 1) % 200 == 0:
            acc = float(accuracy(params, jnp.asarray(xv), jnp.asarray(yv)))
            print(f"step {i+1}: loss {float(loss):.4f} val-acc {acc:.3f}")
    return {k: np.asarray(v) for k, v in params.items()}, float(
        accuracy(params, jnp.asarray(xv), jnp.asarray(yv))
    )


# -- export ------------------------------------------------------------------

def export_ir(params, xml_path: str):
    """Build the IR graph (raw 0-255 input; the 1/255 scale is folded into
    conv1 weights, exactly what Model Optimizer's --scale 255 does —
    reference: convert-model.sh:8-13) and serialize it."""
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.ir.writer import write_ir_model

    b = GraphBuilder("mnist_trained")
    x = b.parameter("conv2d_input", (1, 1, 28, 28))
    y = b.conv2d(x, b.const(params["w1"] / 255.0, "w1"))
    y = b.relu(b.add(y, b.const(params["b1"].reshape(1, -1, 1, 1), "b1")))
    y = b.max_pool(y)
    y = b.conv2d(y, b.const(params["w2"], "w2"))
    y = b.relu(b.add(y, b.const(params["b2"].reshape(1, -1, 1, 1), "b2")))
    y = b.max_pool(y)
    y = b.conv2d(y, b.const(params["w3"], "w3"))
    y = b.relu(b.add(y, b.const(params["b3"].reshape(1, -1, 1, 1), "b3")))
    y = b.reshape(y, (1, 576))
    y = b.matmul(y, b.const(params["w4"], "w4"))
    y = b.relu(b.add(y, b.const(params["b4"].reshape(1, -1), "b4")))
    y = b.matmul(y, b.const(params["w5"], "w5"))
    y = b.add(y, b.const(params["b5"].reshape(1, -1), "b5"))
    y = b.softmax(y, axis=1)
    b.result(y, "prob")
    model = b.build()
    write_ir_model(model, xml_path)
    return model


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "assets", "mnist_trained"))
    ap.add_argument("--device", default="cpu", choices=["cpu", "auto"])
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)

    params, val_acc = train(args.steps, args.batch, args.seed)
    print(f"final val-acc {val_acc:.3f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    xml_path = args.out + ".xml"
    export_ir(params, xml_path)
    print("wrote", xml_path)

    # reload through the public API and verify parity with the JAX forward
    import cv2

    from pyopenvino_tpu import IECore

    ie = IECore()
    net = ie.read_network(xml_path)
    exe = ie.load_network(net, "TPU")
    img = cv2.imread("/root/reference/resources/mnist2.png")
    blob = cv2.split(img)[0].reshape(1, 1, 28, 28).astype(np.float32)
    out = exe.infer({"conv2d_input": blob})
    probs = next(iter(out.values())).reshape(-1)

    import jax.numpy as jnp
    import jax

    ref_logits = forward(params, jnp.asarray(blob / 255.0))
    ref = np.asarray(jax.nn.softmax(ref_logits, axis=-1)).reshape(-1)
    print("IR-vs-JAX max prob diff:", float(np.abs(probs - ref).max()))
    print("mnist2.png predicted digit:", int(np.argmax(probs)),
          f"(p={float(probs.max()):.3f})")


if __name__ == "__main__":
    main()
