"""Train REAL weights through the FLAGSHIP topologies — the actual
googlenet-v1 and ssd_mobilenet_v1_coco IR graphs, channel-narrowed, on
labeled tasks — so the INT8 gates measure task-accuracy deltas through
the very graphs the headline bench runs (VERDICT r4 Next #4).

The reference runs real ImageNet/COCO weights it cannot ship
(reference: README.md:13-18, models/.MISSING_LARGE_BLOBS:1-3) and this
rig has no network, so flagship INT8 accuracy was gated against
fp32-as-pseudo-GT.  This module closes the gap with the strongest
substitute available offline:

  * ``googlenet_shapes`` — the PARSED googlenet-v1.xml graph (all 57
    convs, 9 inception modules, both LRNs, the 7×7 GAP + FC head) with
    every channel count divided by 4 and the classifier resized to the
    10 shapes10 classes, trained at the real 224² input;
  * ``ssd_shapes_ms`` — the PARSED ssd_mobilenet_v1_coco.xml graph (the
    full depthwise backbone and the MULTI-SCALE head: all 6
    PriorBoxClustered branches, 1917 anchors) narrowed ×4 with the
    class dimension resized to 4 shapes + background, trained on
    shapes_det at the real 300² input.

TPU-native trick that makes this honest AND cheap: the training forward
IS the framework's own compiled program — ``CompiledNetwork._fn`` is a
pure JAX function of (weights, inputs), so ``jax.grad`` differentiates
the exact IR execution path (for SSD, the differentiable sub-graph cut
at DetectionOutput's loc/conf inputs via ``extract_subgraph``).  There
is no separate hand-written training forward to keep in parity: the
export writes the trained weight pytree straight back into the IR
Consts.  Anchor targets for SSD come from the model's OWN folded
PriorBoxClustered chain (the compiler's shape analysis values), so
training and inference share one anchor definition by construction.

Usage:
    python tools/train_flagship.py [--model googlenet_shapes ssd_shapes_ms]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAINED_DIR = os.path.join(REPO, "assets", "trained")

# bump to invalidate cached flagship artifacts WHENEVER the recipe
# changes (v2: 1200/1800 steps + cosine decay + SSD grad clipping)
FLAGSHIP_VERSION = 2

# name: (default steps, batch)
FLAGSHIP = {
    "googlenet_shapes": (1200, 32),
    "ssd_shapes_ms": (1800, 16),
}


def _he(rng, shape, fan_in):
    return (rng.standard_normal(shape)
            * np.sqrt(2.0 / max(1, fan_in))).astype(np.float32)


def _set_const(model, nid, arr):
    """Replace a Const's payload AND its declared port info (shape
    inference reads the declared TensorInfo — ops/io_ops.py Const)."""
    from pyopenvino_tpu.ir.model import TensorInfo

    n = model.nodes[nid]
    n.const = arr
    n.outputs[n.out_port] = TensorInfo(shape=tuple(arr.shape),
                                       dtype=arr.dtype)


def _narrow(model, cm, rng, conf_heads=()):
    """Channel-narrow every weight-carrying Const per its consumer's
    semantics, with FRESH init (the synthesized values are retrained
    anyway).  ``cm``: channel-count map; ``conf_heads``: Convolution node
    ids whose output channels are anchors·classes (narrowed by the CLASS
    map, not the channel map)."""
    for n in list(model.nodes.values()):
        for port, (src, _sport) in model.in_edges[n.id].items():
            cn = model.nodes[src]
            if cn.op_type != "Const" or cn.const is None:
                continue
            shp = tuple(int(d) for d in cn.const.shape)
            if n.op_type == "Convolution" and port == 1:
                co, ci, kh, kw = shp
                nci = ci if ci == 3 else cm(ci)
                _set_const(model, src,
                           _he(rng, (cm(co, n.id), nci, kh, kw),
                               nci * kh * kw))
            elif n.op_type == "GroupConvolution" and port == 1:
                # depthwise layout (C, M, 1, kh, kw)
                c, mdepth, one, kh, kw = shp
                _set_const(model, src,
                           _he(rng, (cm(c), mdepth, one, kh, kw), kh * kw))
            elif n.op_type == "MatMul" and port == 1:
                o, i = shp
                _set_const(model, src, _he(rng, (cm(o), cm(i)), cm(i)))
            elif (n.op_type in ("Add", "Multiply", "Subtract")
                  and cn.const.ndim >= 2):
                new = tuple(cm(int(d), n.id) for d in shp)
                # Multiply consts are input scales — a sane fixed gain
                # (the TF-SSD 2/255 preprocessing magnitude), never zero
                fill = np.float32(1.0 / 127.5) if n.op_type == "Multiply" \
                    else np.float32(0.0)
                _set_const(model, src, np.full(new, fill, np.float32))
            elif n.op_type == "Reshape" and port == 1:
                t = np.asarray(
                    [cm(int(v), n.id) if int(v) > 1 else int(v)
                     for v in cn.const.reshape(-1)], cn.const.dtype)
                _set_const(model, src, t)
    return model


# -- googlenet_shapes ---------------------------------------------------------

GOOG_CLASSES = 10
GOOG_FACTOR = 4


def narrow_googlenet(seed: int = 0):
    """googlenet-v1.xml with every channel ÷4, classifier → 10 classes,
    fresh-initialized, shapes revalidated by rederive."""
    from __graft_entry__ import _model_paths
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.passes.shape_infer import rederive_ports

    xml, binp = _model_paths("googlenet-v1")
    m = read_ir_model(xml, binp)
    rng = np.random.default_rng(seed)

    def cm(c, _nid=None):
        if c in (1, 3):
            return c
        if c == 1000:
            return GOOG_CLASSES
        assert c % GOOG_FACTOR == 0, c
        return c // GOOG_FACTOR

    _narrow(m, cm, rng)
    # input normalization: the IR's mean-subtract Add (the node consuming
    # the Parameter) gets a real pixel mean, and the stem conv's init is
    # scaled down so 0..255 inputs don't saturate the fresh network (the
    # same fold every programmatic family applies to conv1)
    p = m.parameters[0]
    for _, dst, _ in m.out_edges[p.id]:
        n = m.nodes[dst]
        if n.op_type == "Add" and 1 in m.in_edges[n.id]:
            src, _ = m.in_edges[n.id][1]
            _set_const(m, src, np.full((1, 3, 1, 1), -127.5, np.float32))
            for _, dst2, _ in m.out_edges[n.id]:
                if m.nodes[dst2].op_type == "Convolution":
                    wsrc, _ = m.in_edges[dst2][1]
                    _set_const(m, wsrc,
                               (m.nodes[wsrc].const / 127.5).astype(
                                   np.float32))
    return rederive_ports(m)


def train_googlenet(steps: int, batch: int, seed: int = 0):
    """Adam on the compiled IR program; returns (trained model,
    val accuracy)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.passes.shape_infer import bake_batch
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tools.datasets import shapes10

    model = narrow_googlenet(seed)
    net = compile_model(bake_batch(model, batch), Config())
    name = net.model.parameters[0].name
    params = {
        k: v for k, v in net.weights.items()
        if not k.startswith("folded.")
        and jnp.issubdtype(v.dtype, jnp.floating)
    }
    frozen = {k: v for k, v in net.weights.items() if k not in params}
    fn = net._fn

    def loss_fn(p, x, y):
        prob = next(iter(fn({**frozen, **p}, {name: x}).values()))
        return -jnp.mean(jnp.log(prob[jnp.arange(x.shape[0]), y] + 1e-9))

    # cosine decay sharpens the endgame: the first 600-step flat-lr run
    # landed at 90% val with int8full sitting exactly on the 0.5 gate —
    # decision margins matter for quantization robustness here
    sched = optax.cosine_decay_schedule(1e-3, steps, alpha=0.01)
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adam(sched))
    ostate = opt.init(params)

    @jax.jit
    def step(p, os_, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        up, os2 = opt.update(g, os_)
        return optax.apply_updates(p, up), os2, loss

    x, y = shapes10(4096, seed, size=224)
    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        idx = rng.integers(0, len(x), batch)
        params, ostate, loss = step(
            params, ostate, jnp.asarray(x[idx]), jnp.asarray(y[idx]))
        if i % 100 == 0 or i == steps - 1:
            print(f"  googlenet_shapes step {i} loss {float(loss):.4f}",
                  flush=True)

    # validation on a disjoint seed, through the same program
    xv, yv = shapes10(256, seed + 7, size=224)
    correct = 0
    w = {**frozen, **params}
    for i in range(0, 256, batch):
        xb = xv[i:i + batch]
        if len(xb) < batch:
            break
        prob = np.asarray(next(iter(fn(w, {name: jnp.asarray(xb)}).values())))
        correct += int((prob.argmax(1) == yv[i:i + batch]).sum())
    val = correct / (256 // batch * batch)

    _write_back(model, params)
    return model, val


def _write_back(model, params):
    """Trained pytree values → the model's Const nodes (str(node id)
    keys, the _build_weights convention)."""
    for k, v in params.items():
        if k.isdigit():
            nid = int(k)
            arr = np.asarray(v, np.float32).reshape(
                model.nodes[nid].const.shape)
            _set_const(model, nid, arr)


# -- ssd_shapes_ms ------------------------------------------------------------

SSD_CLASSES = 5  # 4 shapes + background (class 0)
SSD_FACTOR = 4
SSD_OLD_CLASSES = 91


def narrow_ssd(seed: int = 0):
    """ssd_mobilenet_v1_coco.xml narrowed ×4 with the 91-class COCO head
    resized to 5 classes — the multi-scale structure (6 conf + 6 loc
    branches, all PriorBoxClustered chains) untouched."""
    from __graft_entry__ import _model_paths
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.passes.shape_infer import rederive_ports

    xml, binp = _model_paths("ssd_mobilenet_v1_coco")
    m = read_ir_model(xml, binp)
    rng = np.random.default_rng(seed)

    # head convs: convs from which DetectionOutput is reachable WITHOUT
    # passing through another Convolution — their output channels are
    # anchors·91 (conf) or anchors·4 (loc), not backbone widths
    convs = {n.id for n in m.find_by_type("Convolution")}

    def is_head(nid):
        stack, seen = [nid], set()
        while stack:
            cur = stack.pop()
            for _, dst, _ in m.out_edges[cur]:
                if dst in seen:
                    continue
                seen.add(dst)
                dn = m.nodes[dst]
                if dn.op_type == "DetectionOutput":
                    return True
                if dst in convs or dn.op_type == "GroupConvolution":
                    continue  # a later conv consumes it — backbone
                stack.append(dst)
        return False

    head_convs = {nid for nid in convs if is_head(nid)}
    conf_convs = set()
    for nid in head_convs:
        w_src, _ = m.in_edges[nid][1]
        if int(m.nodes[w_src].const.shape[0]) % SSD_OLD_CLASSES == 0:
            conf_convs.add(nid)
    assert len(conf_convs) == 6 and len(head_convs) == 12, (
        f"expected 6 conf + 6 loc multi-scale heads, found "
        f"{len(conf_convs)}/{len(head_convs)}")
    # head biases follow their conv's convention
    head_like = set(head_convs)
    conf_like = set(conf_convs)
    for nid in list(head_convs):
        for _, dst, _ in m.out_edges[nid]:
            if m.nodes[dst].op_type == "Add":
                head_like.add(dst)
                if nid in conf_convs:
                    conf_like.add(dst)

    def cm(c, nid=None):
        if nid in head_like:
            if nid in conf_like and c % SSD_OLD_CLASSES == 0:
                return c // SSD_OLD_CLASSES * SSD_CLASSES
            return c  # loc heads: anchors·4 stays
        if c % SSD_OLD_CLASSES == 0:  # 91-class dims in Reshape targets
            return c // SSD_OLD_CLASSES * SSD_CLASSES
        if c < 8 or c % SSD_FACTOR:
            return c  # prior counts (1917), box dims (4), odd extents
        return c // SSD_FACTOR

    _narrow(m, cm, rng)
    # DetectionOutput num_classes: 91 → 5
    for n in m.find_by_type("DetectionOutput"):
        n.attrs["num_classes"] = str(SSD_CLASSES)
    return rederive_ports(m)


def _ssd_head_nodes(model):
    """Names of the nodes feeding DetectionOutput ports 0 (loc) and 1
    (conf) — the cut points for the differentiable training graph."""
    do = model.find_by_type("DetectionOutput")[0]
    loc_src, _ = model.in_edges[do.id][0]
    conf_src, _ = model.in_edges[do.id][1]
    return model.nodes[loc_src].name, model.nodes[conf_src].name, do


def _ssd_anchors(model):
    """(priors (P, 4) corner boxes, variances (4,)) from the model's OWN
    folded PriorBoxClustered chain — the tensor DetectionOutput reads."""
    from pyopenvino_tpu.passes.shape_infer import infer_shapes

    analysis = infer_shapes(model)
    do = model.find_by_type("DetectionOutput")[0]
    src, sport = model.in_edges[do.id][2]
    pv = analysis.value(src, sport)
    assert pv is not None, "prior chain did not fold"
    pv = np.asarray(pv, np.float64).reshape(2, -1, 4)
    return pv[0], pv[1]  # (P, 4) boxes, (P, 4) per-anchor variances


def train_ssd(steps: int, batch: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.model import extract_subgraph
    from pyopenvino_tpu.passes.shape_infer import bake_batch
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tools.datasets import shapes_det
    from tools.train_real import encode_det_targets

    model = narrow_ssd(seed)
    loc_name, conf_name, do = _ssd_head_nodes(model)
    priors, variances = _ssd_anchors(model)
    sub = extract_subgraph(model, [loc_name, conf_name])
    net = compile_model(bake_batch(sub, batch), Config())
    in_name = net.model.parameters[0].name
    params = {
        k: v for k, v in net.weights.items()
        if not k.startswith("folded.")
        and jnp.issubdtype(v.dtype, jnp.floating)
    }
    frozen = {k: v for k, v in net.weights.items() if k not in params}
    fn = net._fn
    n_priors = priors.shape[0]
    out_names = {f"{loc_name}/cut": "loc", f"{conf_name}/cut": "conf"}

    def heads(w, x):
        out = fn(w, {in_name: x})
        got = {out_names[k]: v for k, v in out.items()}
        loc = got["loc"].reshape(x.shape[0], n_priors, 4)
        conf = got["conf"].reshape(x.shape[0], n_priors, SSD_CLASSES)
        return loc, conf

    def loss_fn(p, x, tloc, tcls, pos):
        # multibox: smooth-L1 on positives + BCE on sigmoid scores with
        # all-negative background (the conf path ends in Sigmoid, so the
        # traced conf IS a probability)
        loc, conf = heads({**frozen, **p}, x)
        d = loc - tloc
        sl1 = jnp.where(jnp.abs(d) < 1, 0.5 * d * d, jnp.abs(d) - 0.5)
        loc_loss = (sl1.sum(-1) * pos).sum() / jnp.maximum(pos.sum(), 1)
        onehot = jax.nn.one_hot(tcls, SSD_CLASSES)
        conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
        bce = -(onehot * jnp.log(conf)
                + (1 - onehot) * jnp.log(1 - conf)).sum(-1)
        # positives + 3:1 hardest negatives (classic SSD mining): rank
        # negatives per row by loss, keep the top 3·n_pos (min 8)
        neg = 1.0 - pos
        k = jnp.maximum(3.0 * pos.sum(1), 8.0)              # (B,)
        rank = jnp.argsort(jnp.argsort(-(bce * neg), axis=1), axis=1)
        neg_mask = neg * (rank < k[:, None])
        conf_loss = ((bce * (pos + neg_mask)).sum()
                     / jnp.maximum(pos.sum(), 1))
        return loc_loss + conf_loss

    sched = optax.cosine_decay_schedule(1e-3, steps, alpha=0.02)
    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
    ostate = opt.init(params)

    @jax.jit
    def step(p, os_, x, tloc, tcls, pos):
        loss, g = jax.value_and_grad(loss_fn)(p, x, tloc, tcls, pos)
        up, os2 = opt.update(g, os_)
        return optax.apply_updates(p, up), os2, loss

    size = int(model.parameters[0].outputs[0].shape[-1])
    x, gts = shapes_det(2048, seed, size=size)
    # encode targets once against the model's OWN folded anchors
    # (encode_det_targets maps class c → c+1; background stays 0)
    tloc, tcls = [], []
    for g in gts:
        tc, tl = encode_det_targets(list(g), priors, variances)
        tloc.append(tl)
        tcls.append(tc)
    tloc = np.stack(tloc).astype(np.float32)
    tcls = np.stack(tcls).astype(np.int32)
    pos = (tcls > 0).astype(np.float32)

    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        idx = rng.integers(0, len(x), batch)
        params, ostate, loss = step(
            params, ostate, jnp.asarray(x[idx]), jnp.asarray(tloc[idx]),
            jnp.asarray(tcls[idx]), jnp.asarray(pos[idx]))
        if i % 100 == 0 or i == steps - 1:
            print(f"  ssd_shapes_ms step {i} loss {float(loss):.4f}",
                  flush=True)

    _write_back(model, params)

    # quick val mAP through the FULL graph (DetectionOutput included)
    from pyopenvino_tpu.metrics import coco_map, parse_detection_records
    from pyopenvino_tpu.runtime.compiler import compile_model as cmod

    full = cmod(model, Config())
    xv, gv = shapes_det(64, seed + 7, size=size)
    dets, gt = {}, {}
    out = full.infer_batch({model.parameters[0].name: xv})
    recs = next(iter(out.values())).reshape(len(xv), -1, 7)
    for i in range(len(xv)):
        # DetectionOutput labels are GT classes + 1 (0 = background)
        dets[f"v{i}"] = [(c - 1, s, b) for c, s, b in
                         parse_detection_records(recs[i])]
        gt[f"v{i}"] = list(gv[i])
    val = coco_map(gt, dets, iou_thresholds=(0.5,))
    return model, val


# -- cache / registry ---------------------------------------------------------


def flagship_model_paths(name: str, steps: int | None = None):
    """(xml, bin) for a flagship trained family — trains and exports on
    first use, cached with the FLAGSHIP_VERSION sidecar."""
    from __graft_entry__ import _gen_version_ok, _stamp_gen_version
    from pyopenvino_tpu.ir.writer import write_ir_model

    os.makedirs(TRAINED_DIR, exist_ok=True)
    xml = os.path.join(TRAINED_DIR, f"{name}.xml")
    binp = xml[:-4] + ".bin"
    if (os.path.exists(xml) and os.path.exists(binp)
            and _gen_version_ok(xml, FLAGSHIP_VERSION)):
        return xml, binp
    default_steps, batch = FLAGSHIP[name]
    steps = steps or default_steps
    if name == "googlenet_shapes":
        model, val = train_googlenet(steps, batch)
        print(f"googlenet_shapes final val-acc {val:.3f}")
        assert val >= 0.9, f"flagship training underperformed ({val})"
    else:
        model, val = train_ssd(steps, batch)
        print(f"ssd_shapes_ms final val-mAP@0.5 {val:.1f}")
        assert val >= 60, f"flagship SSD training underperformed ({val})"
    write_ir_model(model, xml)
    _stamp_gen_version(xml, FLAGSHIP_VERSION)
    return xml, binp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", nargs="+", default=sorted(FLAGSHIP),
                    choices=sorted(FLAGSHIP))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import select_device

    select_device("cpu")
    for name in args.model:
        if args.force:
            for ext in (".xml", ".bin", ".xml.ver"):
                p = os.path.join(TRAINED_DIR, name + ext)
                if os.path.exists(p):
                    os.remove(p)
        xml, _ = flagship_model_paths(name, args.steps)
        print("ready:", xml)


if __name__ == "__main__":
    main()
