"""The twelfth model family: programmatic dense-gated Mixture-of-Experts
(tools/gen_moe.py) — the model that exercises expert parallelism (EP).

Each MoE layer's experts live in ONE stacked rank-3 Const feeding a batched
MatMul, so EP is a *sharding* of the expert axis over the 'model' mesh axis
(parallel/mesh.py _weight_pspec): each device computes its own experts and
XLA turns the gated ReduceSum combine into the EP all-reduce.  The
reference MatMul is strictly 2-D (op_plugins/MatMul.py:9-17) and the
reference has no Tile / ReduceSum / Gelu, so none of this is expressible
there (SURVEY.md §2.4: EP absent)."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def moe():
    from tools.gen_moe import build_moe

    return build_moe()


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(11)
    return rng.uniform(0, 255, (1, 3, 32, 32)).astype(np.float32)


def test_topology(moe):
    from tools.gen_moe import _EXPERTS, _LAYERS

    const_ids = {n.id for n in moe.find_by_type("Const")}
    mm = moe.find_by_type("MatMul")
    stacked = [
        n for n in mm
        if moe.in_edges[n.id][1][0] in const_ids
        and moe.nodes[moe.in_edges[n.id][1][0]].const.ndim == 3
    ]
    # 2 stacked expert projections per MoE layer
    assert len(stacked) == 2 * _LAYERS
    for n in stacked:
        w = moe.nodes[moe.in_edges[n.id][1][0]].const
        assert w.shape[0] == _EXPERTS
    assert len(moe.find_by_type("Tile")) == _LAYERS
    assert len(moe.find_by_type("ReduceSum")) == _LAYERS
    assert len(moe.find_by_type("Gelu")) == _LAYERS
    # per-layer router softmax + classifier head
    assert len(moe.find_by_type("SoftMax")) == _LAYERS + 1


def test_interpreter_vs_xla(moe, blob):
    ref = Interpreter(moe).run({"input": blob})
    got = compile_model(moe, Config(backend=Backend.XLA)).infer(
        {"input": blob}
    )
    k = next(iter(ref))
    assert got[k].shape == (1, 100)
    np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-6)
    assert abs(float(got[k].sum()) - 1.0) < 1e-3


def test_int8_weight_quant_top1(moe, blob):
    fp = compile_model(moe).infer({"input": blob})
    q = compile_model(moe, Config(quant=QuantMode.INT8_WEIGHT)).infer(
        {"input": blob}
    )
    k = next(iter(fp))
    assert int(np.argmax(fp[k])) == int(np.argmax(q[k]))


def test_expert_parallel_sharding(moe):
    """EP on (data=2, model=4): the stacked expert weights shard their
    expert axis over 'model', outputs match the unsharded network on
    DISTINCT rows, and the compiled program contains the all-reduce of
    the gated expert combine."""
    rng = np.random.default_rng(3)
    batch = rng.uniform(0, 255, (8, 3, 32, 32)).astype(np.float32)
    ref = compile_model(moe).infer_batch({"input": batch})

    compiled = compile_model(moe)
    mesh = build_mesh(MeshConfig(data=2, model=4))
    shard_compiled(compiled, mesh, tensor_parallel=True)

    from tools.gen_moe import _EXPERTS

    expert_sharded = [
        k for k, v in compiled.weights.items()
        if v.ndim == 3 and v.shape[0] == _EXPERTS
        and not v.sharding.is_fully_replicated
        and v.sharding.spec[0] == "model"
    ]
    assert len(expert_sharded) == 4, expert_sharded

    out = compiled.infer_batch({"input": batch})
    k = next(iter(ref))
    np.testing.assert_allclose(out[k], ref[k], rtol=1e-4, atol=1e-6)

    hlo = compiled.batched_fn(8).lower(
        compiled.weights, {"input": batch}
    ).compile().as_text()
    assert hlo.count("all-reduce") >= 1, "no EP combine all-reduce in HLO"


def test_moe_int8w_expert_parallel(moe):
    """INT8 weight-only x EP: rank-3 expert weights quantize per-output-
    channel (scale has no expert dim — stays replicated) and still shard."""
    rng = np.random.default_rng(4)
    batch = rng.uniform(0, 255, (4, 3, 32, 32)).astype(np.float32)
    cfg = Config(quant=QuantMode.INT8_WEIGHT)
    ref = compile_model(moe, cfg).infer_batch({"input": batch})

    compiled = compile_model(moe, cfg)
    shard_compiled(compiled, build_mesh(MeshConfig(data=1, model=2)),
                   tensor_parallel=True)
    out = compiled.infer_batch({"input": batch})
    k = next(iter(ref))
    np.testing.assert_allclose(out[k], ref[k], rtol=1e-4, atol=1e-6)
