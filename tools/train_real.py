"""Train REAL weights for the accuracy gates — MNIST-BN and a
CIFAR-scale shapes ResNet — and export them as OpenVINO IR.

The round-3 gates ran on synthetic weights with self-agreement metrics;
this supplies trained-weight models with labeled eval data so the
INT8w / INT8-FULL gates measure TASK accuracy deltas, the evidence class
of the reference's real-weight assertions (reference:
integrity_test.py:57,83,108,133-152).

Models (cached in assets/trained/, version-stamped like every generated
family — __graft_entry__._gen_version_ok):

  * ``mnist_bn``     — the reference's MNIST-BN topology idea
    (mnist_bn.xml: conv stacks with folded-BN Multiply/Add pairs), here
    trained with REAL BatchNorm statistics: BN (batch stats + running
    EMA) during training, exported as explicit per-channel
    Multiply → Add pairs computed from the TRAINED running stats — so
    the compile-time fold_scale pass (passes/fold_scale.py) folds
    genuine data statistics, not synthesized scales.
  * ``shapes_resnet`` — a CIFAR-scale residual classifier (3 stages
    16/32/64, identity + projection shortcuts, GAP head) on the
    shapes10 task (tools/datasets.py).

Both are defined twice — a JAX training forward and a GraphBuilder
export — with bit-level parity asserted between them at export time
(same pattern as tools/mnist_train.py).

Usage:
    python tools/train_real.py [--model mnist_bn shapes_resnet] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAINED_DIR = os.path.join(REPO, "assets", "trained")

# bump to invalidate cached trained artifacts
TRAINER_VERSION = 3

BN_EPS = 1e-5
BN_MOMENTUM = 0.9


# -- MNIST-BN -----------------------------------------------------------------

def init_mnist_bn(rng: np.random.Generator):
    def he(shape, fan_in):
        return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(
            np.float32)

    params = {
        "w1": he((32, 1, 3, 3), 9),
        "w2": he((64, 32, 3, 3), 288),
        "w3": he((64, 64, 3, 3), 576),
        "w4": he((576, 64), 576), "b4": np.zeros(64, np.float32),
        "w5": he((64, 10), 64), "b5": np.zeros(10, np.float32),
    }
    for i, c in (("1", 32), ("2", 64), ("3", 64)):
        params[f"g{i}"] = np.ones(c, np.float32)    # gamma
        params[f"be{i}"] = np.zeros(c, np.float32)  # beta
    bn_state = {}
    for i, c in (("1", 32), ("2", 64), ("3", 64)):
        bn_state[f"mean{i}"] = np.zeros(c, np.float32)
        bn_state[f"var{i}"] = np.ones(c, np.float32)
    return params, bn_state


def forward_mnist_bn(params, bn_state, x, train: bool):
    """x: (N,1,28,28) in [0,1] → (logits, new_bn_state)."""
    import jax.numpy as jnp
    from jax import lax

    new_state = dict(bn_state)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    def bn(x, i):
        if train:
            mean = x.mean(axis=(0, 2, 3))
            var = x.var(axis=(0, 2, 3))
            new_state[f"mean{i}"] = (
                BN_MOMENTUM * bn_state[f"mean{i}"] + (1 - BN_MOMENTUM) * mean
            )
            new_state[f"var{i}"] = (
                BN_MOMENTUM * bn_state[f"var{i}"] + (1 - BN_MOMENTUM) * var
            )
        else:
            mean = bn_state[f"mean{i}"]
            var = bn_state[f"var{i}"]
        g = params[f"g{i}"].reshape(1, -1, 1, 1)
        be = params[f"be{i}"].reshape(1, -1, 1, 1)
        return g * (x - mean.reshape(1, -1, 1, 1)) / jnp.sqrt(
            var.reshape(1, -1, 1, 1) + BN_EPS
        ) + be

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )

    x = pool(jnp.maximum(bn(conv(x, params["w1"]), "1"), 0))
    x = pool(jnp.maximum(bn(conv(x, params["w2"]), "2"), 0))
    x = jnp.maximum(bn(conv(x, params["w3"]), "3"), 0)
    x = x.reshape(x.shape[0], -1)
    x = jnp.maximum(x @ params["w4"] + params["b4"], 0)
    return x @ params["w5"] + params["b5"], new_state


def export_mnist_bn(params, bn_state, xml_path: str):
    """Raw 0-255 input (1/255 folded into conv1); BN exported as explicit
    Multiply → Add pairs from the TRAINED running stats (the IR shape of
    the reference's mnist_bn.xml) — fold_scale_into_conv folds them at
    compile time."""
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.ir.writer import write_ir_model

    b = GraphBuilder("mnist_bn_trained")
    x = b.parameter("conv2d_input", (1, 1, 28, 28))

    def bn_consts(i):
        s = params[f"g{i}"] / np.sqrt(bn_state[f"var{i}"] + BN_EPS)
        sh = params[f"be{i}"] - bn_state[f"mean{i}"] * s
        return (b.const(s.reshape(1, -1, 1, 1).astype(np.float32), f"bn_s{i}"),
                b.const(sh.reshape(1, -1, 1, 1).astype(np.float32), f"bn_b{i}"))

    y = b.conv2d(x, b.const(params["w1"] / 255.0, "w1"))
    s, sh = bn_consts("1")
    y = b.max_pool(b.relu(b.add(b.multiply(y, s), sh)))
    y = b.conv2d(y, b.const(params["w2"], "w2"))
    s, sh = bn_consts("2")
    y = b.max_pool(b.relu(b.add(b.multiply(y, s), sh)))
    y = b.conv2d(y, b.const(params["w3"], "w3"))
    s, sh = bn_consts("3")
    y = b.relu(b.add(b.multiply(y, s), sh))
    y = b.reshape(y, (1, 576))
    y = b.relu(b.add(b.matmul(y, b.const(params["w4"], "w4")),
                     b.const(params["b4"].reshape(1, -1), "b4")))
    y = b.add(b.matmul(y, b.const(params["w5"], "w5")),
              b.const(params["b5"].reshape(1, -1), "b5"))
    b.result(b.softmax(y, axis=1), "prob")
    write_ir_model(b.build(), xml_path)


def train_mnist_bn(steps: int, batch: int, seed: int):
    import jax
    import jax.numpy as jnp
    import optax

    from tools.datasets import digits

    x, y = digits(12000, seed)
    x = x / 255.0
    xv, yv = jnp.asarray(x[:1000]), jnp.asarray(y[:1000])
    xt, yt = x[1000:], y[1000:]

    params, bn_state = init_mnist_bn(np.random.default_rng(seed))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bn_state, opt_state, xb, yb):
        def loss_fn(p):
            logits, new_bn = forward_mnist_bn(p, bn_state, xb, train=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bn, opt_state, loss

    @jax.jit
    def accuracy(params, bn_state, xb, yb):
        logits, _ = forward_mnist_bn(params, bn_state, xb, train=False)
        return (logits.argmax(-1) == yb).mean()

    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        idx = rng.integers(0, len(yt), batch)
        params, bn_state, opt_state, loss = step(
            params, bn_state, opt_state,
            jnp.asarray(xt[idx]), jnp.asarray(yt[idx]),
        )
        if (i + 1) % 200 == 0:
            acc = float(accuracy(params, bn_state, xv, yv))
            print(f"mnist_bn step {i + 1}: loss {float(loss):.4f} "
                  f"val-acc {acc:.3f}")
    val = float(accuracy(params, bn_state, xv, yv))
    return ({k: np.asarray(v) for k, v in params.items()},
            {k: np.asarray(v) for k, v in bn_state.items()}, val)


# -- shapes ResNet --------------------------------------------------------------

STAGES = (16, 32, 64)  # CIFAR-style widths


def init_shapes_resnet(rng: np.random.Generator):
    def he(shape, fan_in):
        return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(
            np.float32)

    p = {"stem_w": he((16, 3, 3, 3), 27), "stem_b": np.zeros(16, np.float32)}
    cin = 16
    for si, c in enumerate(STAGES):
        stride_proj = cin != c
        p[f"s{si}_w1"] = he((c, cin, 3, 3), cin * 9)
        p[f"s{si}_b1"] = np.zeros(c, np.float32)
        p[f"s{si}_w2"] = he((c, c, 3, 3), c * 9)
        p[f"s{si}_b2"] = np.zeros(c, np.float32)
        if stride_proj:
            p[f"s{si}_wp"] = he((c, cin, 1, 1), cin)
            p[f"s{si}_bp"] = np.zeros(c, np.float32)
        cin = c
    p["fc_w"] = he((STAGES[-1], 10), STAGES[-1])
    p["fc_b"] = np.zeros(10, np.float32)
    return p


def forward_shapes_resnet(p, x):
    """x: (N,3,32,32) in [0,1] → logits (N,10)."""
    import jax.numpy as jnp
    from jax import lax

    def conv(x, w, b, stride=1, pad=1):
        out = lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out + b.reshape(1, -1, 1, 1)

    x = jnp.maximum(conv(x, p["stem_w"], p["stem_b"]), 0)
    for si, c in enumerate(STAGES):
        stride = 1 if si == 0 else 2
        y = jnp.maximum(
            conv(x, p[f"s{si}_w1"], p[f"s{si}_b1"], stride=stride), 0)
        y = conv(y, p[f"s{si}_w2"], p[f"s{si}_b2"])
        if f"s{si}_wp" in p:
            x = conv(x, p[f"s{si}_wp"], p[f"s{si}_bp"], stride=stride, pad=0)
        x = jnp.maximum(x + y, 0)
    x = x.mean(axis=(2, 3))  # GAP
    return x @ p["fc_w"] + p["fc_b"]


def export_shapes_resnet(p, xml_path: str):
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.ir.writer import write_ir_model

    b = GraphBuilder("shapes_resnet_trained")
    x = b.parameter("data", (1, 3, 32, 32))

    def conv(x, w, bias, stride=1, pad=1, name=""):
        y = b.conv2d(x, b.const(w, name + "_w"), strides=(stride, stride),
                     pads=((pad, pad), (pad, pad)))
        return b.add(y, b.const(bias.reshape(1, -1, 1, 1), name + "_b"))

    # 1/255 input scale folded into the stem (Model Optimizer --scale 255)
    y = b.relu(conv(x, p["stem_w"] / 255.0, p["stem_b"], name="stem"))
    for si, c in enumerate(STAGES):
        stride = 1 if si == 0 else 2
        z = b.relu(conv(y, p[f"s{si}_w1"], p[f"s{si}_b1"], stride=stride,
                        name=f"s{si}c1"))
        z = conv(z, p[f"s{si}_w2"], p[f"s{si}_b2"], name=f"s{si}c2")
        if f"s{si}_wp" in p:
            y = conv(y, p[f"s{si}_wp"], p[f"s{si}_bp"], stride=stride,
                     pad=0, name=f"s{si}p")
        y = b.relu(b.add(y, z, name=f"s{si}_sum"))
    gap = b.reduce("Mean", y, axes=(2, 3), keep_dims=False, name="gap")
    logits = b.add(b.matmul(gap, b.const(p["fc_w"], "fc_w")),
                   b.const(p["fc_b"].reshape(1, -1), "fc_b"))
    b.result(b.softmax(logits, axis=1), "prob")
    write_ir_model(b.build(), xml_path)


def train_shapes_resnet(steps: int, batch: int, seed: int):
    import jax
    import jax.numpy as jnp
    import optax

    from tools.datasets import shapes10

    x, y = shapes10(14000, seed)
    x = x / 255.0
    xv, yv = jnp.asarray(x[:1000]), jnp.asarray(y[:1000])
    xt, yt = x[1000:], y[1000:]

    params = init_shapes_resnet(np.random.default_rng(seed))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = forward_shapes_resnet(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, xb, yb):
        return (forward_shapes_resnet(params, xb).argmax(-1) == yb).mean()

    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        idx = rng.integers(0, len(yt), batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(xt[idx]), jnp.asarray(yt[idx]))
        if (i + 1) % 200 == 0:
            acc = float(accuracy(params, xv, yv))
            print(f"shapes_resnet step {i + 1}: loss {float(loss):.4f} "
                  f"val-acc {acc:.3f}")
    val = float(accuracy(params, xv, yv))
    return {k: np.asarray(v) for k, v in params.items()}, val


# -- artifact cache --------------------------------------------------------------

TRAINED = {
    # name: (input_name, default steps)
    "mnist_bn": ("conv2d_input", 800),
    "shapes_resnet": ("data", 1400),
}


def trained_model_paths(name: str, steps: int | None = None):
    """(xml, bin) for a trained family — trains and exports on first use,
    cached with the TRAINER_VERSION sidecar."""
    from __graft_entry__ import _gen_version_ok, _stamp_gen_version

    os.makedirs(TRAINED_DIR, exist_ok=True)
    xml = os.path.join(TRAINED_DIR, f"{name}.xml")
    binp = xml[:-4] + ".bin"
    if (os.path.exists(xml) and os.path.exists(binp)
            and _gen_version_ok(xml, TRAINER_VERSION)):
        return xml, binp
    steps = steps or TRAINED[name][1]
    if name == "mnist_bn":
        params, bn_state, val = train_mnist_bn(steps, 128, seed=0)
        print(f"mnist_bn final val-acc {val:.3f}")
        export_mnist_bn(params, bn_state, xml)
        _verify_export(xml, lambda blob: forward_mnist_bn(
            params, bn_state, blob / 255.0, train=False)[0],
            "conv2d_input", (1, 1, 28, 28))
    elif name == "shapes_resnet":
        params, val = train_shapes_resnet(steps, 128, seed=0)
        print(f"shapes_resnet final val-acc {val:.3f}")
        export_shapes_resnet(params, xml)
        _verify_export(xml, lambda blob: forward_shapes_resnet(
            params, blob / 255.0), "data", (1, 3, 32, 32))
    else:
        raise KeyError(name)
    _stamp_gen_version(xml, TRAINER_VERSION)
    return xml, binp


def _verify_export(xml: str, jax_forward, in_name: str, shape):
    """Exported IR must match the training forward bit-tight (same dual-
    definition parity check as tools/mnist_train.py)."""
    import jax
    import jax.numpy as jnp

    from pyopenvino_tpu import IECore

    ie = IECore()
    exe = ie.load_network(ie.read_network(xml), "TPU")
    rng = np.random.default_rng(3)
    blob = rng.uniform(0, 255, shape).astype(np.float32)
    got = next(iter(exe.infer({in_name: blob}).values())).reshape(-1)
    want = np.asarray(
        jax.nn.softmax(jax_forward(jnp.asarray(blob)), axis=-1)
    ).reshape(-1)
    diff = float(np.abs(got - want).max())
    assert diff < 1e-4, f"export parity broke: max prob diff {diff}"
    print(f"{os.path.basename(xml)}: IR-vs-JAX max prob diff {diff:.2e}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", nargs="+", default=sorted(TRAINED),
                    choices=sorted(TRAINED))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--force", action="store_true",
                    help="retrain even if a cached artifact exists")
    ap.add_argument("--device", default="cpu", choices=["cpu", "auto"])
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device(args.device)
    for name in args.model:
        if args.force:
            for ext in (".xml", ".bin", ".xml.ver"):
                path = os.path.join(TRAINED_DIR, name + ext)
                if os.path.exists(path):
                    os.remove(path)
        xml, binp = trained_model_paths(name, args.steps)
        print("ready:", xml)


if __name__ == "__main__":
    main()
