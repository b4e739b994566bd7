"""The eleventh model family: programmatic tiny ViT (tools/gen_vit.py)
— the first attention-based model in the suite.

Exercises graph shapes none of the other ten families do: MatMul over
two activation operands (Q·Kᵀ, attn·V), rank-4 batched MatMul with
transpose_b, SoftMax over the last axis of a rank-4 tensor, rank-3
MVN-as-LayerNorm with affine Multiply/Add, head split/merge via
Reshape+Transpose, and Gelu MLPs.  The reference engine has no
attention op and no rank>2 MatMul (op_plugins/MatMul.py is 2-D only)."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def vit():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("vit-tiny")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)


def test_topology(vit):
    # 4 blocks x (q,k,v,proj,fc1,fc2) + qkT + av per block + head:
    # 25 weight MatMuls + 8 activation-x-activation MatMuls.
    mm = vit.find_by_type("MatMul")
    assert len(mm) == 33
    const_ids = {n.id for n in vit.find_by_type("Const")}
    act_mm = [n for n in mm
              if vit.in_edges[n.id][1][0] not in const_ids]
    assert len(act_mm) == 8  # Q·Kᵀ and attn·V in each of 4 blocks
    assert len(vit.find_by_type("MVN")) == 9       # 2/block + final LN
    assert len(vit.find_by_type("Gelu")) == 4
    assert len(vit.find_by_type("Convolution")) == 1  # patch embed only
    # 4 attention softmaxes on axis 3 + the classifier head on axis 1
    axes = sorted(int(n.attrs["axis"]) for n in vit.find_by_type("SoftMax"))
    assert axes == [1, 3, 3, 3, 3]


def test_interpreter_vs_xla(vit, blob):
    ref = Interpreter(vit).run({"data": blob})
    net = compile_model(vit, Config(backend=Backend.XLA))
    got = net.infer({"data": blob})
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == (1, 100)
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)
    assert abs(float(next(iter(got.values())).sum()) - 1.0) < 1e-3


def test_int8_modes_preserve_ranking(vit, blob):
    ref = compile_model(vit, Config()).infer({"data": blob})
    k = next(iter(ref))
    top_ref = np.argsort(ref[k][0])[::-1][:3]

    for quant in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        cal = None
        if quant == QuantMode.INT8_FULL:
            rng = np.random.default_rng(1)
            cal = [{"data": blob},
                   {"data": rng.uniform(0, 255, blob.shape).astype(
                       np.float32)}]
        net = compile_model(vit, Config(quant=quant),
                            calibration_samples=cal)
        out = net.infer({"data": blob})
        top = np.argsort(out[k][0])[::-1][:3]
        assert top[0] == top_ref[0], (quant, top, top_ref)


def test_batched_attention(vit, blob):
    """infer_batch vmaps the whole graph — the rank-4 attention
    MatMuls and axis-3 softmax must survive an extra mapped axis."""
    net = compile_model(vit, Config())
    ref = net.infer({"data": blob})
    rng = np.random.default_rng(3)
    other = rng.uniform(0, 255, blob.shape).astype(np.float32)
    batch = np.concatenate([blob, other, blob], axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    assert out[k].shape == (3, 100)
    np.testing.assert_allclose(out[k][0], ref[k][0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[k][2], ref[k][0], rtol=1e-4, atol=1e-6)
    assert not np.allclose(out[k][1], ref[k][0], atol=1e-3)


def test_sharded_dp_tp(vit, blob):
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    net = compile_model(vit, Config())
    ref = net.infer({"data": blob})
    shard_compiled(net, build_mesh(MeshConfig(data=4, model=2)),
                   tensor_parallel=True)
    batch = np.repeat(blob, 4, axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(out[k][b], ref[k][0], rtol=1e-4,
                                   atol=1e-6)
