"""Train REAL weights for the accuracy gates — MNIST-BN, a CIFAR-scale
shapes ResNet, and a toy single-scale SSD detector — exported as
OpenVINO IR.

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
  * ``shapes_ssd``     — a single-scale SSD on shapes_det (96×96, 1..3
    boxes/image): stride-8 backbone, 3 square anchors/cell, loc/conf 1×1
    heads, exported through the reference SSD IR shape (Transpose/
    Reshape flatten → SoftMax → PriorBoxClustered → DetectionOutput) so
    the real-GT mAP gate exercises the whole detection pipeline.
    Anchors come from ops/ssd.py prior_boxes_clustered — training and
    the exported PriorBoxClustered node share one definition.

All are defined twice — a JAX training forward and a GraphBuilder
export — with bit-level parity asserted between them at export time
(same pattern as tools/mnist_train.py).

Usage:
    python tools/train_real.py [--model mnist_bn shapes_resnet shapes_ssd] [--steps N]
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


# -- shapes SSD (toy detector — the real-mAP gate) ----------------------------

DET_IMG = 96
DET_GRID = 12            # stride-8 feature map
DET_ANCHORS = (24.0, 32.0, 40.0)   # square anchors, px (box sizes 26-40)
DET_VARIANCE = (0.1, 0.1, 0.2, 0.2)
DET_NC = 5               # background + 4 shape classes
DET_WIDTHS = (24, 48, 64, 64)


def det_anchors():
    """(anchors (P,4) normalized corners, variances (P,4)) — computed by
    THE SAME function the exported PriorBoxClustered node runs
    (ops/ssd.py prior_boxes_clustered), so training and inference share
    one anchor definition; prior order (gy, gx, anchor)."""
    from pyopenvino_tpu.ops.ssd import prior_boxes_clustered

    out = prior_boxes_clustered(
        (DET_GRID, DET_GRID), (DET_IMG, DET_IMG),
        widths=DET_ANCHORS, heights=DET_ANCHORS,
        step=float(DET_IMG // DET_GRID), step_h=0.0, step_w=0.0,
        offset=0.5, variance=DET_VARIANCE, img_h=0.0, img_w=0.0,
    )
    P = out.shape[1] // 4
    return out[0].reshape(P, 4), out[1].reshape(P, 4)


def init_shapes_ssd(rng: np.random.Generator):
    def he(shape, fan_in):
        return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(
            np.float32)

    A = len(DET_ANCHORS)
    w1, w2, w3, w4 = DET_WIDTHS
    p = {
        "c1": he((w1, 3, 3, 3), 27), "b1": np.zeros(w1, np.float32),
        "c2": he((w2, w1, 3, 3), w1 * 9), "b2": np.zeros(w2, np.float32),
        "c3": he((w3, w2, 3, 3), w2 * 9), "b3": np.zeros(w3, np.float32),
        "c4": he((w4, w3, 3, 3), w3 * 9), "b4": np.zeros(w4, np.float32),
        "loc_w": he((A * 4, w4, 1, 1), w4) * 0.1,
        "loc_b": np.zeros(A * 4, np.float32),
        "conf_w": he((A * DET_NC, w4, 1, 1), w4) * 0.1,
        "conf_b": np.zeros(A * DET_NC, np.float32),
    }
    return p


def forward_shapes_ssd(p, x):
    """x: (N,3,96,96) in [0,1] → (loc (N,P,4), conf logits (N,P,C)) in
    prior order (gy, gx, anchor) — NCHW→NHWC transpose then flatten,
    matching the exported Transpose/Reshape head."""
    import jax.numpy as jnp
    from jax import lax

    def conv(x, w, b, stride=1, pad=1):
        out = lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out + b.reshape(1, -1, 1, 1)

    x = jnp.maximum(conv(x, p["c1"], p["b1"], stride=2), 0)
    x = jnp.maximum(conv(x, p["c2"], p["b2"], stride=2), 0)
    x = jnp.maximum(conv(x, p["c3"], p["b3"], stride=2), 0)
    x = jnp.maximum(conv(x, p["c4"], p["b4"]), 0)
    loc = conv(x, p["loc_w"], p["loc_b"], pad=0)
    conf = conv(x, p["conf_w"], p["conf_b"], pad=0)

    def to_prior(t, k):
        return t.transpose(0, 2, 3, 1).reshape(t.shape[0], -1, k)

    return to_prior(loc, 4), to_prior(conf, DET_NC)


def encode_det_targets(gts, anchors, variances):
    """One image's GT [(cls, (x0,y0,x1,y1) normalized)] → per-anchor
    (cls target (P,) int32 with 0=background, loc target (P,4)).  SSD
    matching: every anchor with IoU>0.5 takes its best GT; every GT
    force-claims its best anchor.  Encoding is the exact inverse of
    ops/ssd.py _decode CENTER_SIZE-with-variances."""
    P = anchors.shape[0]
    cls_t = np.zeros(P, np.int32)
    loc_t = np.zeros((P, 4), np.float32)
    if not gts:
        return cls_t, loc_t
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    g = np.asarray([b for _, b in gts], np.float32)  # (G,4)
    ix0 = np.maximum(g[:, None, 0], anchors[None, :, 0])
    iy0 = np.maximum(g[:, None, 1], anchors[None, :, 1])
    ix1 = np.minimum(g[:, None, 2], anchors[None, :, 2])
    iy1 = np.minimum(g[:, None, 3], anchors[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    iou = inter / (area_g[:, None] + (aw * ah)[None, :] - inter)

    assigned = np.full(P, -1, np.int64)
    best_gt, best_iou = iou.argmax(0), iou.max(0)
    assigned[best_iou > 0.5] = best_gt[best_iou > 0.5]
    for gi in range(len(gts)):
        assigned[iou[gi].argmax()] = gi  # GT force-claims its best anchor
    sel = assigned >= 0
    gi = assigned[sel]
    gcx = (g[gi, 0] + g[gi, 2]) / 2
    gcy = (g[gi, 1] + g[gi, 3]) / 2
    gw = g[gi, 2] - g[gi, 0]
    gh = g[gi, 3] - g[gi, 1]
    v = variances[sel]
    cls_t[sel] = np.asarray([gts[i][0] for i in gi]) + 1
    loc_t[sel, 0] = (gcx - acx[sel]) / (v[:, 0] * aw[sel])
    loc_t[sel, 1] = (gcy - acy[sel]) / (v[:, 1] * ah[sel])
    loc_t[sel, 2] = np.log(gw / aw[sel]) / v[:, 2]
    loc_t[sel, 3] = np.log(gh / ah[sel]) / v[:, 3]
    return cls_t, loc_t


def _det_attrs():
    """DetectionOutput attrs shared by export, trainer eval, and parity
    check."""
    return dict(
        num_classes=DET_NC, background_label_id=0, top_k=50,
        keep_top_k=(20,), nms_threshold=0.45, confidence_threshold=0.25,
        code_type="caffe.PriorBoxParameter.CENTER_SIZE",
        share_location=True, variance_encoded_in_target=False,
        clip_after_nms=False, clip_before_nms=False,
        decrease_label_id=False, normalized=True,
        input_height=1, input_width=1,
    )


def det_eval_map(params, x, gts):
    """Real mAP (full COCO IoU grid) of the trainer forward + the op
    library's own DetectionOutput reference on a labeled set."""
    import jax.numpy as jnp

    from pyopenvino_tpu.metrics import coco_map, parse_detection_records
    from pyopenvino_tpu.ops.ssd import detection_output_ref

    anchors, variances = det_anchors()
    proposals = np.stack(
        [anchors.reshape(-1), variances.reshape(-1)]
    )[None].astype(np.float32)
    loc, conf = forward_shapes_ssd(params, jnp.asarray(x / 255.0))
    import jax

    prob = np.asarray(jax.nn.softmax(conf, axis=-1))
    loc = np.asarray(loc)
    p = _det_attrs()
    gt, det = {}, {}
    for i in range(len(x)):
        rec = detection_output_ref(
            loc[i].reshape(1, -1), prob[i].reshape(1, -1), proposals, p
        )
        det[i] = [(c - 1, s, b) for c, s, b in parse_detection_records(rec)]
        gt[i] = gts[i]
    return coco_map(gt, det)


def export_shapes_ssd(p, xml_path: str):
    """The SSD IR shape: backbone → loc/conf 1×1 heads →
    Transpose/Reshape flatten → SoftMax class probabilities →
    PriorBoxClustered anchors (Const-fed, constant-folded) → Unsqueeze →
    DetectionOutput record table (reference architecture:
    models/ssd_mobilenet_v1_coco.xml)."""
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.ir.writer import write_ir_model

    A = len(DET_ANCHORS)
    P = DET_GRID * DET_GRID * A
    b = GraphBuilder("shapes_ssd_trained")
    x = b.parameter("data", (1, 3, DET_IMG, DET_IMG))

    def conv(x, w, bias, stride=1, pad=1, name=""):
        y = b.conv2d(x, b.const(w, name + "_w"), strides=(stride, stride),
                     pads=((pad, pad), (pad, pad)))
        return b.add(y, b.const(bias.reshape(1, -1, 1, 1), name + "_b"))

    # 1/255 input scale folded into conv1 (Model Optimizer --scale 255)
    y = b.relu(conv(x, p["c1"] / 255.0, p["b1"], stride=2, name="c1"))
    y = b.relu(conv(y, p["c2"], p["b2"], stride=2, name="c2"))
    y = b.relu(conv(y, p["c3"], p["b3"], stride=2, name="c3"))
    y = b.relu(conv(y, p["c4"], p["b4"], name="c4"))
    loc = conv(y, p["loc_w"], p["loc_b"], pad=0, name="loc")
    conf = conv(y, p["conf_w"], p["conf_b"], pad=0, name="conf")
    loc_f = b.reshape(b.transpose(loc, (0, 2, 3, 1), name="loc_t"),
                      (1, P * 4), name="loc_flat")
    conf_r = b.reshape(b.transpose(conf, (0, 2, 3, 1), name="conf_t"),
                       (1, P, DET_NC), name="conf_r")
    conf_s = b.softmax(conf_r, axis=2, name="conf_prob")
    conf_f = b.reshape(conf_s, (1, P * DET_NC), name="conf_flat")
    pri = b.prior_box_clustered(
        (DET_GRID, DET_GRID), (DET_IMG, DET_IMG), DET_ANCHORS, DET_ANCHORS,
        step=float(DET_IMG // DET_GRID), offset=0.5, variance=DET_VARIANCE,
        name="priors")
    a = _det_attrs()
    det = b.detection_output(
        loc_f, conf_f, b.unsqueeze(pri, (0,), name="priors3"),
        num_classes=DET_NC, keep_top_k=a["keep_top_k"][0], top_k=a["top_k"],
        nms_threshold=a["nms_threshold"],
        confidence_threshold=a["confidence_threshold"],
        code_type=a["code_type"], name="do")
    b.result(det, "detections")
    write_ir_model(b.build(), xml_path)


def train_shapes_ssd(steps: int, batch: int, seed: int):
    import jax
    import jax.numpy as jnp
    import optax

    from tools.datasets import shapes_det

    x, gts = shapes_det(6000, seed)
    anchors, variances = det_anchors()
    enc = [encode_det_targets(g, anchors, variances) for g in gts]
    cls_t = np.stack([e[0] for e in enc])
    loc_t = np.stack([e[1] for e in enc])
    xv, gv = x[:300], gts[:300]
    xt, ct, lt = x[300:] / 255.0, cls_t[300:], loc_t[300:]

    params = init_shapes_ssd(np.random.default_rng(seed))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, cb, lb):
        def loss_fn(p):
            loc_p, conf_p = forward_shapes_ssd(p, xb)
            ce = optax.softmax_cross_entropy_with_integer_labels(conf_p, cb)
            pos = cb > 0
            npos = pos.sum(axis=1)
            # hard-negative mining at 3:1 — rank negatives by loss
            neg_ce = jnp.where(pos, -jnp.inf, ce)
            rank = jnp.argsort(jnp.argsort(-neg_ce, axis=1), axis=1)
            neg_sel = (rank < (3 * npos)[:, None]) & ~pos
            denom = jnp.maximum(npos.sum(), 1)
            conf_loss = (ce * (pos | neg_sel)).sum() / denom
            diff = loc_p - lb
            huber = jnp.where(
                jnp.abs(diff) < 1, 0.5 * diff**2, jnp.abs(diff) - 0.5)
            loc_loss = (huber.sum(-1) * pos).sum() / denom
            return conf_loss + loc_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        idx = rng.integers(0, len(ct), batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(xt[idx]),
            jnp.asarray(ct[idx]), jnp.asarray(lt[idx]))
        if (i + 1) % 300 == 0:
            host = {k: np.asarray(v) for k, v in params.items()}
            m = det_eval_map(host, xv[:120], gv[:120])
            print(f"shapes_ssd step {i + 1}: loss {float(loss):.4f} "
                  f"val-mAP {m:.1f}")
    params = {k: np.asarray(v) for k, v in params.items()}
    return params, det_eval_map(params, xv, gv)


def _verify_export_ssd(xml: str, params):
    """Shipped-IR parity: the framework's DetectionOutput records on the
    compiled path must match the op library's numpy reference fed by the
    training forward (dual-definition check, detector edition)."""
    import jax
    import jax.numpy as jnp

    from pyopenvino_tpu import IECore
    from pyopenvino_tpu.ops.ssd import detection_output_ref

    anchors, variances = det_anchors()
    proposals = np.stack(
        [anchors.reshape(-1), variances.reshape(-1)]
    )[None].astype(np.float32)
    ie = IECore()
    exe = ie.load_network(ie.read_network(xml), "TPU")
    rng = np.random.default_rng(3)
    from tools.datasets import shapes_det

    xb, _ = shapes_det(2, 12345)
    diffs = []
    for i in range(len(xb)):
        got = next(iter(exe.infer({"data": xb[i][None]}).values()))
        loc, conf = forward_shapes_ssd(params, jnp.asarray(xb[i][None] / 255.0))
        prob = np.asarray(jax.nn.softmax(conf, axis=-1))
        want = detection_output_ref(
            np.asarray(loc).reshape(1, -1), prob.reshape(1, -1),
            proposals, _det_attrs())
        diffs.append(float(np.abs(got - want).max()))
    diff = max(diffs)
    assert diff < 1e-3, f"detector export parity broke: max diff {diff}"
    print(f"{os.path.basename(xml)}: IR-vs-JAX max record diff {diff:.2e}")


# -- Keras-trained digits (the reference's OWN pipeline, end to end) ----------

def train_keras_digits(steps: int):
    """Train a Keras CNN on the labeled digits task and convert it with
    tools/tf_convert.py — the reference's full workflow (train in
    TF/Keras, convert with --scale 255, run in the engine:
    mnist-tf-training.py + convert-model.sh) executed natively, so the
    accuracy gate on this family also gates the converter itself.
    Returns (keras_model, val_acc)."""
    import keras

    from tools.datasets import digits

    x, y = digits(12000, seed=10)
    x = (x / 255.0).transpose(0, 2, 3, 1)  # NCHW 0-255 → NHWC [0,1]
    xv, yv = x[:1000], y[:1000]
    xt, yt = x[1000:], y[1000:]

    km = keras.Sequential([
        keras.layers.Input((28, 28, 1)),
        keras.layers.Conv2D(16, 3, padding="same", use_bias=False),
        keras.layers.BatchNormalization(),
        keras.layers.ReLU(),
        keras.layers.MaxPooling2D(2),
        keras.layers.Conv2D(32, 3, padding="same", use_bias=False),
        keras.layers.BatchNormalization(),
        keras.layers.ReLU(),
        keras.layers.MaxPooling2D(2),
        keras.layers.Flatten(),
        keras.layers.Dense(64, activation="relu"),
        keras.layers.Dense(10, activation="softmax"),
    ])
    km.compile(optimizer=keras.optimizers.Adam(1e-3),
               loss="sparse_categorical_crossentropy",
               metrics=["accuracy"])
    batch = 128
    epochs = max(1, (steps * batch) // len(yt))
    km.fit(xt, yt, batch_size=batch, epochs=epochs, verbose=0)
    val = float((km.predict(xv, verbose=0).argmax(1) == yv).mean())
    return km, val


def _verify_export_keras(xml: str, km):
    """Converted IR must match keras.predict bit-tight."""
    import numpy as _np

    from pyopenvino_tpu import IECore

    ie = IECore()
    exe = ie.load_network(ie.read_network(xml), "TPU")
    rng = _np.random.default_rng(3)
    blob = rng.uniform(0, 255, (1, 1, 28, 28)).astype(_np.float32)
    got = next(iter(exe.infer({"data": blob}).values())).reshape(-1)
    want = km.predict(
        (blob / 255.0).transpose(0, 2, 3, 1), verbose=0).reshape(-1)
    diff = float(_np.abs(got - want).max())
    assert diff < 1e-4, f"keras conversion parity broke: max diff {diff}"
    print(f"{os.path.basename(xml)}: IR-vs-Keras max prob diff {diff:.2e}")


# -- Torch-trained digits (gates tools/torch_convert.py end to end) ----------

def train_torch_digits(steps: int):
    """Train a small torch CNN (with BatchNorm — the fold must reproduce
    real running stats) on the labeled digits task; returns
    (module.eval(), val_acc).  The converted-IR gate on this family
    validates tools/torch_convert.py the way keras_digits validates the
    TF on-ramp."""
    import torch
    import torch.nn as nn

    from tools.datasets import digits

    x, y = digits(12000, seed=20)
    x = (x / 255.0).astype(np.float32)
    xv = torch.from_numpy(x[:1000])
    yv = torch.from_numpy(y[:1000].astype(np.int64))
    xt = torch.from_numpy(x[1000:])
    yt = torch.from_numpy(y[1000:].astype(np.int64))

    torch.manual_seed(0)
    net = nn.Sequential(
        nn.Conv2d(1, 16, 3, padding=1, bias=False),
        nn.BatchNorm2d(16), nn.ReLU(), nn.MaxPool2d(2),
        nn.Conv2d(16, 32, 3, padding=1, bias=False),
        nn.BatchNorm2d(32), nn.ReLU(), nn.MaxPool2d(2),
        nn.Flatten(),
        nn.Linear(32 * 7 * 7, 64), nn.ReLU(),
        nn.Linear(64, 10),
    )
    opt = torch.optim.Adam(net.parameters(), 1e-3)
    loss_fn = nn.CrossEntropyLoss()
    g = torch.Generator().manual_seed(1)
    net.train()
    for i in range(steps):
        idx = torch.randint(0, len(yt), (128,), generator=g)
        opt.zero_grad()
        loss = loss_fn(net(xt[idx]), yt[idx])
        loss.backward()
        opt.step()
        if (i + 1) % 200 == 0:
            net.eval()
            with torch.no_grad():
                acc = float((net(xv).argmax(1) == yv).float().mean())
            print(f"torch_digits step {i + 1}: loss {float(loss):.4f} "
                  f"val-acc {acc:.3f}")
            net.train()
    net.eval()
    with torch.no_grad():
        val = float((net(xv).argmax(1) == yv).float().mean())
    return net, val


def _verify_export_torch(xml: str, net):
    """Converted IR must match the torch eval forward bit-tight."""
    import numpy as _np
    import torch

    from pyopenvino_tpu import IECore

    ie = IECore()
    exe = ie.load_network(ie.read_network(xml), "TPU")
    rng = _np.random.default_rng(3)
    blob = rng.uniform(0, 255, (1, 1, 28, 28)).astype(_np.float32)
    got = next(iter(exe.infer({"data": blob}).values())).reshape(-1)
    with torch.no_grad():
        want = net(torch.from_numpy(blob / 255.0)).numpy().reshape(-1)
    diff = float(_np.abs(got - want).max())
    assert diff < 1e-4, f"torch conversion parity broke: max diff {diff}"
    print(f"{os.path.basename(xml)}: IR-vs-torch max logit diff {diff:.2e}")


# -- artifact cache --------------------------------------------------------------

TRAINED = {
    # name: (input_name, default steps)
    "mnist_bn": ("conv2d_input", 800),
    "shapes_resnet": ("data", 1400),
    "shapes_ssd": ("data", 3000),
    "keras_digits": ("data", 800),
    "torch_digits": ("data", 1600),
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
    elif name == "shapes_ssd":
        params, val = train_shapes_ssd(steps, 32, seed=0)
        print(f"shapes_ssd final val-mAP {val:.1f}")
        export_shapes_ssd(params, xml)
        _verify_export_ssd(xml, params)
    elif name == "keras_digits":
        from pyopenvino_tpu.ir.writer import write_ir_model
        from tools.tf_convert import convert_keras_model

        km, val = train_keras_digits(steps)
        print(f"keras_digits final val-acc {val:.3f}")
        write_ir_model(
            convert_keras_model(km, scale=255.0, input_name="data"), xml)
        _verify_export_keras(xml, km)
    elif name == "torch_digits":
        from pyopenvino_tpu.ir.writer import write_ir_model
        from tools.torch_convert import convert_torch_module

        tnet, val = train_torch_digits(steps)
        print(f"torch_digits final val-acc {val:.3f}")
        m = convert_torch_module(tnet, (1, 1, 28, 28), "torch_digits")
        # MO --scale parity: fold 1/255 into the FIRST Convolution's
        # weight (selected via its weight edge, not a first-4D-const
        # heuristic that would silently mis-scale if node order changed)
        conv1 = next(n for n in m if n.op_type == "Convolution")
        wsrc, _ = m.in_edges[conv1.id][1]
        wnode = m.nodes[wsrc]
        wnode.const = (wnode.const / 255.0).astype(np.float32)
        write_ir_model(m, xml)
        _verify_export_torch(xml, tnet)
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
