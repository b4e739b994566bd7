"""Epilogue fusion: Conv/GroupConv/MatMul → Add(const bias) → ReLU/Clamp.

The reference executes bias-add and activation as separate graph nodes, each
a full Python-dispatch round trip with the tensor bounced through the node
store (reference: inference_engine.py:259-292 executes one node per
iteration; GoogLeNet's 57 Conv are each followed by Add+ReLU nodes).  Here
those chains are collapsed at compile time so the whole group runs inside
one Pallas GEMM epilogue while the accumulator is still in VMEM
(kernels/gemm.py), or as one XLA fusion on the non-Pallas path.

A chain fuses only when each intermediate output has exactly one consumer
(otherwise some other node still needs the unfused tensor) and the Add's
second operand is a Const broadcasting purely over the channel dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ir.model import Model
from pyopenvino_tpu.passes.util import channel_aligned, single_consumer

_ROOTS = ("Convolution", "GroupConvolution", "MatMul")


@dataclasses.dataclass
class Fusion:
    root: int                                # conv/matmul node id
    bias_src: Optional[Tuple[int, int]]      # (const node id, out port)
    act: Optional[tuple]                     # ("relu",0,0) | ("clamp",lo,hi)
    out_key: Tuple[int, int]                 # (node id, port) to register under
    skip: Tuple[int, ...]                    # absorbed node ids


_single_consumer = single_consumer


def _out_channels(model: Model, analysis, node) -> int:
    shape = analysis.shape(node.id, node.out_port)
    if node.op_type in ("Convolution", "GroupConvolution"):
        return shape[1]  # NCHW
    return shape[-1]  # MatMul


def _bias_ok(bias_shape, channels: int, root_type: str) -> bool:
    """Const must broadcast over the channel dim only."""
    if int(np.prod(bias_shape)) != channels:
        return False
    if root_type == "MatMul":
        return bias_shape[-1] == channels
    # conv: the const must broadcast over the NCHW CHANNEL axis — a
    # rank-1 (C,) vector right-aligns to W instead, so when W == C the
    # Add is a per-column offset the fusion would silently turn into a
    # per-channel bias (passes/util.py channel_aligned)
    return channel_aligned(bias_shape, channels)


def find_fusions(model: Model, analysis) -> Dict[int, Fusion]:
    fusions: Dict[int, Fusion] = {}
    for node in model:
        if node.op_type not in _ROOTS:
            continue
        channels = _out_channels(model, analysis, node)
        chain_end, bias_src, act = node, None, None
        skip = []

        nxt = _single_consumer(model, chain_end.id)
        if nxt is not None and nxt[0].op_type == "Add":
            add_node, data_port = nxt[0], nxt[1]
            other_port = 1 - data_port
            src, sport = model.in_edges[add_node.id][other_port]
            src_node = model.nodes[src]
            if src_node.op_type == "Const" and _bias_ok(
                analysis.shape(src, sport), channels, node.op_type
            ):
                bias_src = (src, sport)
                skip.append(add_node.id)
                chain_end = add_node
                nxt = _single_consumer(model, chain_end.id)

        if nxt is not None and nxt[1] == 0:
            act_node = nxt[0]
            if act_node.op_type == "ReLU":
                act = ("relu", 0.0, 0.0)
            elif act_node.op_type == "Clamp":
                act = (
                    "clamp",
                    A.get_float(act_node.attrs, "min"),
                    A.get_float(act_node.attrs, "max"),
                )
            if act is not None:
                skip.append(act_node.id)
                chain_end = act_node

        if skip:
            fusions[node.id] = Fusion(
                root=node.id,
                bias_src=bias_src,
                act=act,
                out_key=(chain_end.id, chain_end.out_port),
                skip=tuple(skip),
            )
    return fusions
