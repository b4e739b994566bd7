"""Synthesize a .bin weights blob for an IR .xml whose real weights are
unavailable (the reference strips googlenet-v1.bin / mnist_bn.bin /
ssd_mobilenet_v1_coco.bin — reference: models/.MISSING_LARGE_BLOBS:1-3).

Float constants get deterministic scaled-normal values (He init for conv
weights, ~1 for Multiply/BN scales, ~0 for Add biases) so deep nets keep sane
activation magnitudes for differential testing.  Integer constants are
*semantic* — reshape targets, transpose permutations, slice bounds — so they
are inferred from the graph structure (consumer op + declared port shapes);
tests/test_shapes.py then validates that shape inference over the generated
weights reproduces every declared dim in the XML.

Usage: python tools/gen_weights.py <model.xml> <out.bin>
"""

from __future__ import annotations

import itertools
import sys
from typing import Optional

import numpy as np

from pyopenvino_tpu.ir.model import ELEMENT_TYPE_TO_DTYPE, Model, Node


def _infer_transpose_axes(in_dims, out_dims) -> Optional[np.ndarray]:
    used = [False] * len(in_dims)
    axes = []
    for od in out_dims:
        for i, idim in enumerate(in_dims):
            if not used[i] and idim == od:
                used[i] = True
                axes.append(i)
                break
        else:
            return None
    return np.array(axes, dtype=np.int64)


def _infer_unsqueeze_axes(in_dims, out_dims) -> Optional[np.ndarray]:
    n_new = len(out_dims) - len(in_dims)
    one_positions = [i for i, d in enumerate(out_dims) if d == 1]
    for combo in itertools.combinations(one_positions, n_new):
        kept = [d for i, d in enumerate(out_dims) if i not in combo]
        if tuple(kept) == tuple(in_dims):
            return np.array(combo, dtype=np.int64)
    return None


def _int_const_value(model: Model, nodes, shape) -> np.ndarray:
    """Infer a semantically-correct value for an integer Const region from
    its consumers; falls back to ones.  `nodes` is every Const node aliasing
    the same .bin region (the real SSD blob shares one [1, -1, 1, 4] reshape
    target across all six box predictors), so the value must satisfy the
    union of their consumers."""
    n_elem = int(np.prod(shape)) if shape else 1
    edges = [e for node in nodes for e in model.out_edges[node.id]]
    # Reshape targets: emit -1 at any axis that varies across consumers.
    reshape_outs = [
        tuple(model.nodes[dst].outputs[model.nodes[dst].out_port].shape)
        for _, dst, dport in edges
        if model.nodes[dst].op_type == "Reshape" and dport == 1
    ]
    if reshape_outs:
        dims = []
        for axis_vals in zip(*reshape_outs):
            dims.append(axis_vals[0] if len(set(axis_vals)) == 1 else -1)
        if dims.count(-1) <= 1 and len(set(len(o) for o in reshape_outs)) == 1:
            return np.array(dims, dtype=np.int64)
        # heterogeneous targets sharing bytes: fall back to [first, -1, ...]
        dims = [reshape_outs[0][0]] + [-1] * (len(reshape_outs[0]) - 1)
        return np.array(dims, dtype=np.int64)
    for _, dst, dport in edges:
        consumer = model.nodes[dst]
        out_info = (
            consumer.outputs[consumer.out_port] if consumer.outputs else None
        )
        if consumer.op_type == "Transpose" and dport == 1 and out_info:
            axes = _infer_transpose_axes(
                consumer.inputs[0].shape, out_info.shape
            )
            if axes is not None:
                return axes
        if consumer.op_type == "Unsqueeze" and dport == 1 and out_info:
            axes = _infer_unsqueeze_axes(
                consumer.inputs[0].shape, out_info.shape
            )
            if axes is not None:
                return axes
        if consumer.op_type == "StridedSlice" and dport in (1, 2, 3):
            # Emit exactly n_elem entries (one per sliced axis) — a
            # begin/end const may declare >1 element for multi-axis
            # slices, and a 1-element array would crash the final
            # reshape-to-declared-shape.
            in_shape = consumer.inputs[0].shape
            if dport == 3:
                return np.ones(n_elem, dtype=np.int64)  # strides
            # per-axis extent being sliced (for a 1-D shape vector — the
            # SSD pattern — this is just its length)
            extents = list(in_shape)[:n_elem]
            extents += [1] * (n_elem - len(extents))
            if dport == 2:  # end: up to each axis extent
                return np.asarray(extents, dtype=np.int64)
            if len(in_shape) == 1 and n_elem == 1:
                # begin: the trailing out_len entries of the shape vector
                out_len = (out_info.shape[0]
                           if out_info and out_info.shape else 1)
                return np.array([in_shape[0] - out_len], dtype=np.int64)
            return np.zeros(n_elem, dtype=np.int64)  # begin per axis
        if consumer.op_type == "LRN" and dport == 1:
            return np.array([1], dtype=np.int64)  # across-channel axes
    return np.ones(n_elem, dtype=np.int64)


# Bump when synthesis changes so cached assets/*.bin regenerate
# (consumed by __graft_entry__._model_paths via a .ver sidecar).
GENERATOR_VERSION = 3  # v3: cls_w 0.3x He + hot bias N(8.5, 2.5)


def _class_head_roles(model: Model) -> dict:
    """{const node id: 'cls_w' | 'cls_b'} for the consts feeding an SSD
    class-prediction head (everything upstream of DetectionOutput's class
    input, port 1, up to the producing Convolutions).

    Plain He-init weights saturate the sigmoid'ed class scores (~half the
    1917×91 logits land above 0, so max-over-91-classes ≈ 1.0 for every
    prior and the record table degenerates to a full top-100 of conf≈0.98 —
    useless for NMS realism or accuracy evaluation).  Real detector heads
    see a background sea: the head biases get a strongly negative mean with
    per-channel spread so detections are sparse and confidence-ranked."""
    roles: dict = {}
    for do in model.find_by_type("DetectionOutput"):
        if 1 not in model.in_edges[do.id]:
            continue
        stack = [model.in_edges[do.id][1][0]]
        seen = set()
        while stack:
            src = stack.pop()
            if src in seen:
                continue
            seen.add(src)
            node = model.nodes[src]
            if node.op_type in ("Convolution", "GroupConvolution", "MatMul"):
                w_src = model.in_edges[src].get(1)
                if w_src and model.nodes[w_src[0]].op_type == "Const":
                    roles[w_src[0]] = "cls_w"
                continue  # stop — don't descend into the shared backbone
            if node.op_type == "Const":
                continue
            for port, (s, _sp) in model.in_edges[src].items():
                if node.op_type == "Add" and model.nodes[s].op_type == "Const":
                    roles[s] = "cls_b"
                else:
                    stack.append(s)
    return roles


def _float_const_value(model: Model, node: Node, shape, rng,
                       roles: Optional[dict] = None) -> np.ndarray:
    """Scaled random floats keyed to the consumer's role."""
    role = (roles or {}).get(node.id)
    if role == "cls_b":
        # background-sea bias: most class logits deeply negative, a thin
        # per-channel tail crossing the confidence threshold
        # background sea with a thin hot-channel tail: tuned so, over
        # 1917 priors × 90 foreground classes, a few dozen logits cross the
        # 0.3 confidence threshold and a handful reach high confidence —
        # the regime a trained detector actually produces
        bias = rng.normal(-10.5, 1.2, size=shape)
        hot = rng.random(size=shape) < 0.008
        return bias + hot * rng.normal(8.5, 2.5, size=shape)
    if role == "cls_w":
        # class-head conv weights at 0.3× He: the feature contribution
        # modulates the bias-driven logits instead of swamping them, so
        # detection rankings are margin-stable — the fp32-perturbation
        # noise floor of the mAP gate drops ~4× and the INT8 delta
        # measures engine error, not NMS-survivor churn
        fan_in = int(np.prod(shape[-3:]))
        return rng.normal(0.0, 0.3 * np.sqrt(2.0 / max(fan_in, 1)),
                          size=shape)
    for _, dst, dport in model.out_edges[node.id]:
        consumer = model.nodes[dst]
        if consumer.op_type in ("Convolution", "GroupConvolution") and dport == 1:
            fan_in = int(np.prod(shape[-3:]))  # (I|Ci, Kh, Kw)
            std = np.sqrt(2.0 / max(fan_in, 1))
            return rng.normal(0.0, std, size=shape)
        if consumer.op_type == "MatMul" and dport == 1:
            fan_in = shape[0]
            return rng.normal(0.0, np.sqrt(2.0 / max(fan_in, 1)), size=shape)
        if consumer.op_type == "Multiply":
            return 1.0 + rng.normal(0.0, 0.02, size=shape)
        if consumer.op_type == "Add":
            return rng.normal(0.0, 0.02, size=shape)
    return rng.normal(0.0, 0.05, size=shape)


def generate_weights(model: Model, seed: int = 0) -> bytes:
    """Build the full .bin blob for every Const (offset/size layout from the
    XML)."""
    total = 0
    groups = {}  # (offset, size) → [Const nodes aliasing that region]
    for node in model.find_by_type("Const"):
        offset = int(node.attrs["offset"])
        size = int(node.attrs["size"])
        groups.setdefault((offset, size), []).append(node)
        total = max(total, offset + size)

    roles = _class_head_roles(model)
    blob = bytearray(total)
    for (offset, size), nodes in groups.items():
        node = nodes[0]
        dtype = np.dtype(ELEMENT_TYPE_TO_DTYPE[node.attrs["element_type"]])
        shape = tuple(
            int(t) for t in node.attrs.get("shape", "").split(",") if t.strip()
        )
        rng = np.random.default_rng(seed * 1_000_003 + offset)
        if np.issubdtype(dtype, np.floating):
            arr = _float_const_value(model, node, shape, rng, roles).astype(dtype)
        else:
            arr = _int_const_value(model, nodes, shape).astype(dtype)
            arr = arr.reshape(shape) if shape else arr.reshape(())
        raw = np.ascontiguousarray(arr).tobytes()
        assert len(raw) == size, (
            f"{node.name}: generated {len(raw)} bytes, layout wants {size}"
        )
        blob[offset : offset + size] = raw
    return bytes(blob)


def main():
    from pyopenvino_tpu.ir import read_ir_model

    xml_path, out_path = sys.argv[1], sys.argv[2]
    model = read_ir_model(xml_path, weights_path="/nonexistent")
    blob = generate_weights(model)
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {out_path}")


if __name__ == "__main__":
    main()
