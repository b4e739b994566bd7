"""Programmatic tiny Vision Transformer in OpenVINO IR v10 — the
eleventh model family, and the first attention-based one.

Exercises graph shapes none of the other ten families do: MatMul over
two *activation* operands (Q·Kᵀ and attn·V — every other MatMul in the
suite takes a Const weight on port 1), rank-4 batched MatMul with
transpose_b, SoftMax over the last axis of a rank-4 tensor, rank-3
MVN-as-LayerNorm (across_channels=0 reduces exactly the embedding
axis) with affine Multiply/Add, head split/merge via Reshape+Transpose,
Gelu MLPs, and a ReduceMean token-pooling head.  The reference engine
has no attention op, no rank>2 MatMul, and dies on Gelu/MVN/ReduceMean
(inference_engine.py:270-272).

Topology (dim 128, 4 heads x 32, 4 blocks, pre-LN):
  conv 8x8/s8 patch embed (1,3,64,64) -> (1,128,8,8) -> 64 tokens
  + learned position embedding
  4 x [LN -> MHA -> +res -> LN -> MLP(512, Gelu) -> +res]
  LN -> ReduceMean over tokens -> Linear(100) -> SoftMax

Usage:
    python tools/gen_vit.py out.xml      # writes out.xml + out.bin
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: E402
from pyopenvino_tpu.ir.writer import write_ir_model  # noqa: E402


# Bump when the topology/weight synthesis changes so the cached
# assets/vit-tiny.{xml,bin} regenerate (__graft_entry__._model_paths).
GENERATOR_VERSION = 1

_DIM = 128
_HEADS = 4
_HDIM = _DIM // _HEADS
_TOKENS = 64            # (64/8)^2 patches
_MLP = 4 * _DIM
_DEPTH = 4


def _linear(b, rng, x, co, std=None, name=None):
    """x (1,N,Ci) @ W (Ci,co) + bias — token-wise dense layer."""
    ci = x.shape[-1]
    std = std if std is not None else np.sqrt(1.0 / ci)
    w = rng.normal(0, std, (ci, co)).astype(np.float32)
    bias = rng.normal(0, 0.02, (1, 1, co)).astype(np.float32)
    return b.add(b.matmul(x, b.const(w), name=name), b.const(bias))


def _layernorm(b, rng, x):
    """MVN across the embedding axis + learned affine.  On a rank-3
    (1,N,C) tensor across_channels=0 reduces axes (2,), i.e. exactly
    LayerNorm over C (ops/extended.py MVN._apply)."""
    g = (1.0 + rng.normal(0, 0.02, (1, 1, _DIM))).astype(np.float32)
    beta = rng.normal(0, 0.02, (1, 1, _DIM)).astype(np.float32)
    normed = b.mvn(x, across_channels=False, eps=1e-6)
    return b.add(b.multiply(normed, b.const(g)), b.const(beta))


def _attention(b, rng, x, blk):
    """Multi-head self-attention over (1,N,C) tokens."""
    q = _linear(b, rng, x, _DIM, name=f"blk{blk}/q")
    k = _linear(b, rng, x, _DIM, name=f"blk{blk}/k")
    v = _linear(b, rng, x, _DIM, name=f"blk{blk}/v")

    def heads(t):  # (1,N,C) -> (1,H,N,c)
        return b.transpose(b.reshape(t, (1, _TOKENS, _HEADS, _HDIM)),
                           (0, 2, 1, 3))

    qh, kh, vh = heads(q), heads(k), heads(v)
    # Q·Kᵀ — both operands are activations; scores (1,H,N,N)
    scores = b.matmul(qh, kh, transpose_b=True, name=f"blk{blk}/qkT")
    scale = np.full((1, 1, 1, 1), 1.0 / np.sqrt(_HDIM), np.float32)
    attn = b.softmax(b.multiply(scores, b.const(scale)), axis=3)
    ctxv = b.matmul(attn, vh, name=f"blk{blk}/av")  # (1,H,N,c)
    merged = b.reshape(b.transpose(ctxv, (0, 2, 1, 3)),
                       (1, _TOKENS, _DIM))
    return _linear(b, rng, merged, _DIM, name=f"blk{blk}/proj")


def build_vit(num_classes: int = 100, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder("vit-tiny")
    x = b.parameter("data", (1, 3, 64, 64))

    # Patch embed: 8x8/s8 conv with the 1/255 input scale folded in
    # (reference: convert-model.sh:8-13, like every programmatic family).
    pw = rng.normal(0, np.sqrt(2.0 / (3 * 8 * 8)), (_DIM, 3, 8, 8)).astype(
        np.float32) / 255.0
    pb = rng.normal(0, 0.02, (1, _DIM, 1, 1)).astype(np.float32)
    emb = b.add(b.conv2d(x, b.const(pw), strides=(8, 8)), b.const(pb))

    # (1,C,8,8) -> (1,C,N) -> (1,N,C) token sequence + position embedding
    tok = b.transpose(b.reshape(emb, (1, _DIM, _TOKENS)), (0, 2, 1))
    pos = rng.normal(0, 0.02, (1, _TOKENS, _DIM)).astype(np.float32)
    h = b.add(tok, b.const(pos))

    for blk in range(_DEPTH):
        h = b.add(h, _attention(b, rng, _layernorm(b, rng, h), blk))
        m = _linear(b, rng, _layernorm(b, rng, h), _MLP,
                    std=np.sqrt(2.0 / _DIM), name=f"blk{blk}/fc1")
        m = _linear(b, rng, b.gelu(m), _DIM, name=f"blk{blk}/fc2")
        h = b.add(h, m)

    pooled = b.reduce("Mean", _layernorm(b, rng, h), axes=(1,),
                      keep_dims=False)  # (1,C) token mean

    # Class head with the hot-bias ladder every programmatic family
    # uses: near-tied random logits flip under any int8 rounding and
    # poison the top-1 agreement gates; a decaying bias on a few random
    # classes gives the ranking real margins.
    w = rng.normal(0, np.sqrt(1.0 / _DIM), (_DIM, num_classes)).astype(
        np.float32)
    bias = rng.normal(0, 0.02, (1, num_classes)).astype(np.float32)
    hot = rng.choice(num_classes, 4, replace=False)
    bias[0, hot] += np.array([8.0, 6.0, 4.5, 3.5], np.float32)
    logits = b.add(b.matmul(pooled, b.const(w), name="head"), b.const(bias))
    b.result(b.softmax(logits, axis=1), name="prob")
    return b.build()


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "vit-tiny.xml"
    model = build_vit()
    write_ir_model(model, xml_path)
    print(f"wrote {xml_path} (+ .bin): {len(model.nodes)} nodes")


if __name__ == "__main__":
    main()
