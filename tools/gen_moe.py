"""Programmatic Mixture-of-Experts classifier in OpenVINO IR v10 — the
twelfth model family, and the one that exercises expert parallelism (EP).

A dense-gated MoE: every expert computes and a softmax router weights the
combine (exact — no token dropping), which is both the honest formulation
at this expert count and the one expressible as pure tensor ops.  The
experts of each MoE layer live in ONE stacked rank-3 Const (E, Ci, Ch) fed
to a batched MatMul — that single design choice is what makes expert
parallelism a *sharding* (P('model') on the expert axis; XLA turns the
gated ReduceSum over experts into the EP all-reduce) instead of a
per-expert scatter of separate weight tensors.  The reference engine has
only 2-D MatMul (op_plugins/MatMul.py:9-17) and no Tile/ReduceSum/Gelu, so
it cannot express any of this.

Topology (32x32x3 input, 100 classes, 2 MoE layers of 8 experts):
  conv 3x3/s2 32ch relu -> conv 3x3/s2 64ch relu -> GAP -> (1, 64)
  2 x [router softmax gate (1,E); tiled tokens (E,1,64) @ W_in (E,64,128)
       -> Gelu -> @ W_out (E,128,64) -> gate-weighted ReduceSum over E
       -> +residual -> ReLU]
  linear 100 -> SoftMax

Usage:
    python tools/gen_moe.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402

# Bump when the topology/weight synthesis changes so the cached
# assets/moe-mlp.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

_DIM = 64
_HIDDEN = 128
_EXPERTS = 8
_LAYERS = 2
_CLASSES = 100


def _moe_layer(b, rng, x, layer: int):
    """x: (1, DIM) -> (1, DIM) via dense-gated expert mixture."""
    # router: (1, DIM) @ (DIM, E) -> softmax gate (1, E)
    wr = rng.normal(0, np.sqrt(1.0 / _DIM), (_DIM, _EXPERTS)).astype(
        np.float32
    )
    gate = b.softmax(
        b.matmul(x, b.const(wr), name=f"moe{layer}/router"), axis=1
    )
    # broadcast tokens to every expert: (1, DIM) -> (E, 1, DIM)
    xt = b.tile(
        b.reshape(x, (1, 1, _DIM)), (_EXPERTS, 1, 1),
        name=f"moe{layer}/tile",
    )
    # stacked expert weights — ONE rank-3 Const per projection
    w_in = rng.normal(
        0, np.sqrt(1.0 / _DIM), (_EXPERTS, _DIM, _HIDDEN)
    ).astype(np.float32)
    w_out = rng.normal(
        0, np.sqrt(1.0 / _HIDDEN), (_EXPERTS, _HIDDEN, _DIM)
    ).astype(np.float32)
    h = b.gelu(
        b.matmul(xt, b.const(w_in), name=f"moe{layer}/expert_in")
    )
    y = b.matmul(h, b.const(w_out), name=f"moe{layer}/expert_out")
    # gate-weighted combine: (E,1,DIM) * (E,1,1) -> ReduceSum over E
    gt = b.reshape(
        b.transpose(gate, (1, 0)), (_EXPERTS, 1, 1),
        name=f"moe{layer}/gateT",
    )
    mix = b.reduce(
        "Sum", b.multiply(y, gt), axes=(0,), keep_dims=False,
        name=f"moe{layer}/combine",
    )  # (1, DIM)
    return b.relu(b.add(mix, x), name=f"moe{layer}/out")


def build_moe() -> "object":
    rng = np.random.default_rng(2024)
    b = GraphBuilder("moe-mlp")
    x = b.parameter("input", (1, 3, 32, 32))

    def conv_block(x, co, name):
        ci = x.shape[1]
        w = rng.normal(0, np.sqrt(2.0 / (ci * 9)), (co, ci, 3, 3)).astype(
            np.float32
        )
        bias = rng.normal(0, 0.05, (1, co, 1, 1)).astype(np.float32)
        y = b.conv2d(x, b.const(w), strides=(2, 2), pads=((1, 1), (1, 1)),
                     name=name)
        return b.relu(b.add(y, b.const(bias)))

    x = conv_block(x, 32, "stem1")       # (1, 32, 16, 16)
    x = conv_block(x, _DIM, "stem2")     # (1, 64, 8, 8)
    x = b.reduce("Mean", x, axes=(2, 3), keep_dims=False, name="gap")
    # (1, 64)
    for layer in range(_LAYERS):
        x = _moe_layer(b, rng, x, layer)

    wc = rng.normal(0, np.sqrt(1.0 / _DIM), (_DIM, _CLASSES)).astype(
        np.float32
    )
    bc = rng.normal(0, 0.02, (1, _CLASSES)).astype(np.float32)
    logits = b.add(b.matmul(x, b.const(wc), name="head"), b.const(bc))
    b.result(b.softmax(logits, axis=1), name="prob")
    return b.build()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "moe-mlp.xml"
    write_ir_model(build_moe(), out)
    print(f"wrote {out} (+ .bin)")
