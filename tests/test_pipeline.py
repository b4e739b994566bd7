"""Pipeline parallelism (parallel/pipeline.py).

The reference has no partitioning of any kind (SURVEY.md §2.4); these tests
validate the TPU-native pipeline tier on the 8-virtual-device CPU mesh:
cut-point discovery, stage partitioning invariants, and end-to-end output
parity of the SPMD GPipe schedule against the single-device compiled path —
across stage counts, DP×PP meshes, and quantization modes.
"""

import numpy as np
import pytest

from tests.conftest import model_paths

from pyopenvino_tpu.config import Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.parallel.pipeline import (
    PP_IN,
    PP_OUT,
    build_pipeline_mesh,
    choose_cuts,
    compile_pipelined,
    find_cut_candidates,
    partition,
)
from pyopenvino_tpu.passes.shape_infer import infer_shapes
from pyopenvino_tpu.runtime.compiler import compile_model, prepare_model


def _mnist():
    xml, binp = model_paths("mnist")
    return read_ir_model(xml, binp)


def _blob(batch, shape=(1, 28, 28), seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (batch,) + shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Partitioning invariants
# ---------------------------------------------------------------------------


def test_cut_candidates_single_tensor_and_unfused():
    """Every candidate is a floating single-tensor articulation point and
    never strictly INSIDE a conv+bias+act fusion group (cutting at a
    group's chain end is valid — the whole group lies before it)."""
    from pyopenvino_tpu.passes.fuse import find_fusions

    model, _, _, _ = prepare_model(_mnist(), Config())
    analysis = infer_shapes(model)
    rt, cands = find_cut_candidates(model, analysis)
    assert cands, "MNIST must have at least one cut point"
    fusions = find_fusions(model, analysis)
    pos = {nid: i for i, nid in enumerate(rt)}
    interior = set()
    for f in fusions.values():
        ps = [pos[n] for n in (f.root,) + f.skip if n in pos]
        interior.update(range(min(ps), max(ps)))
    for c in cands:
        assert c.pos not in interior
        node = model.nodes[c.node_id]
        assert np.issubdtype(node.outputs[c.port].dtype, np.floating)
        # articulation: every runtime edge crossing pos comes from the node
        for e in model.edges:
            if e.src in pos and e.dst in pos and pos[e.src] <= c.pos < pos[e.dst]:
                assert (e.src, e.src_port) == (c.node_id, c.port)


def test_partition_is_a_cover():
    """Stage runtime nodes tile the full runtime node set exactly once;
    boundary stages carry the synthetic Parameter/Result pairs."""
    model, _, _, _ = prepare_model(_mnist(), Config())
    analysis = infer_shapes(model)
    rt, cuts = choose_cuts(model, analysis, 3)
    specs = partition(model, rt, cuts)
    assert len(specs) == 3

    seen = []
    for s, spec in enumerate(specs):
        ids = [
            n.id for n in spec.model
            if n.op_type not in ("Const", "Result") and n.name != PP_IN
        ]
        seen.extend(ids)
        names = {n.name for n in spec.model.nodes.values()}
        assert (PP_IN in names) == (s > 0)
        assert (PP_OUT in names) == (s < 2)
    assert sorted(seen) == sorted(rt)
    # original Results live in the last stage only
    assert {r.name for r in specs[-1].model.results} >= {
        r.name for r in model.results
    }


def test_googlenet_cuts_land_on_block_boundaries():
    """The balanced DP picks articulation tensors between inception blocks
    (Concat outputs) / stem ops — not mid-block."""
    xml, binp = model_paths("googlenet-v1")
    model, _, _, _ = prepare_model(read_ir_model(xml, binp), Config())
    analysis = infer_shapes(model)
    _, cuts = choose_cuts(model, analysis, 4)
    assert len(cuts) == 3
    types = {model.nodes[c.node_id].op_type for c in cuts}
    assert types <= {"Concat", "LRN", "MaxPool", "ReLU", "AvgPool"}


def test_too_many_stages_is_a_clear_error():
    model, _, _, _ = prepare_model(_mnist(), Config())
    analysis = infer_shapes(model)
    with pytest.raises(ValueError, match="cut points"):
        choose_cuts(model, analysis, 64)


# ---------------------------------------------------------------------------
# End-to-end parity (SPMD schedule vs single-device compiled path)
# ---------------------------------------------------------------------------


def _parity(model_name, mesh, config=None, batch=8, atol=1e-4, cal=False):
    xml, binp = model_paths(model_name)
    model = read_ir_model(xml, binp)
    name = model.parameters[0].name
    shape = tuple(model.parameters[0].outputs[0].shape[1:])
    blob = _blob(batch, shape)
    kw = {}
    if cal:
        rng = np.random.default_rng(7)
        kw["calibration_samples"] = [
            {name: rng.uniform(0, 255, (1,) + shape).astype(np.float32)}
            for _ in range(4)
        ]
    ref = compile_model(
        read_ir_model(xml, binp), config, **kw
    ).infer_batch({name: blob})
    pp = compile_pipelined(read_ir_model(xml, binp), mesh, config, **kw)
    out = pp.infer_batch({name: blob})
    assert set(out) == set(ref)
    for k in out:
        assert out[k].shape == ref[k].shape
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-4, atol=atol)
    return pp


def test_mnist_pp2():
    _parity("mnist", build_pipeline_mesh(2))


def test_mnist_pp4_dp2():
    pp = _parity("mnist", build_pipeline_mesh(4, data=2), batch=16)
    assert pp.n_stages == 4 and pp.data_ax == 2


def test_mnist_pp2_dp2_int8_weight():
    _parity(
        "mnist", build_pipeline_mesh(2, data=2),
        Config(quant=QuantMode.INT8_WEIGHT), batch=8,
    )


def test_mnist_pp2_int8_full():
    """Full-INT8 (calibrated activations + int8 dataflow) — quantization
    runs on the WHOLE graph before partitioning, so the pipelined output is
    bit-identical to the single-device INT8-FULL program."""
    _parity(
        "mnist", build_pipeline_mesh(2),
        Config(quant=QuantMode.INT8_FULL), batch=8, cal=True, atol=1e-5,
    )


def test_googlenet_pp4_dp2():
    """323-layer GoogLeNet across a (data=2, stage=4) mesh — heterogeneous
    inception-block stages through the flat activation ring."""
    _parity("googlenet-v1", build_pipeline_mesh(4, data=2), batch=8)


def test_explicit_n_micro_and_errors():
    xml, binp = model_paths("mnist")
    model = read_ir_model(xml, binp)
    name = model.parameters[0].name
    pp = compile_pipelined(model, build_pipeline_mesh(2, data=2))
    blob = _blob(8)
    ref = pp.infer_batch({name: blob})
    # explicit n_micro values give the same answer (schedule-invariant)
    for n_micro in (1, 2, 4):
        out = pp.infer_batch({name: blob}, n_micro=n_micro)
        np.testing.assert_allclose(
            out[pp.output_names[0]], ref[pp.output_names[0]],
            rtol=1e-5, atol=1e-5,
        )
    with pytest.raises(ValueError, match="microbatch"):
        pp.infer_batch({name: _blob(8)}, n_micro=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        pp.infer_batch({name: _blob(7)})  # 7 not shardable over data=2


def test_microbatch_order_preserved():
    """Row i of the batch maps to row i of every output (the microbatch
    ring must not permute examples)."""
    xml, binp = model_paths("mnist")
    model = read_ir_model(xml, binp)
    name = model.parameters[0].name
    pp = compile_pipelined(model, build_pipeline_mesh(2))
    blob = _blob(8, seed=3)
    out = pp.infer_batch({name: blob})[pp.output_names[0]]
    single = compile_model(read_ir_model(xml, binp))
    for i in (0, 3, 7):
        one = single.infer_batch({name: blob[i:i + 1]})
        np.testing.assert_allclose(
            out[i], one[pp.output_names[0]][0], rtol=1e-4, atol=1e-4
        )


def test_vit_pp4():
    """Transformer pipelining — the classic PP workload: the tiny ViT cuts
    between attention blocks (15 articulation points) onto 4 stages."""
    _parity("vit-tiny", build_pipeline_mesh(4), batch=8, atol=1e-3)


def test_unet_pp2_segmentation():
    """Non-classifier pipeline: U-Net's skip connections leave exactly one
    articulation tensor; the 2-stage cut must carry the full-resolution
    segmentation output through the flat activation ring."""
    pp = _parity("unet", build_pipeline_mesh(2), batch=4, atol=1e-4)
    assert len(pp.cuts) == 1


def test_ssd_pp2_detection():
    """SSD pipelines once compile-time-folded subtrees stop counting as
    frontier crossings: the ShapeOf→PriorBoxClustered anchor chains are
    live across the whole trunk but produce no runtime tensor — each
    stage regenerates them from zero-Const shape stand-ins (exact: value
    propagation reads runtime tensors only through ShapeOf).  The full
    detection record table must match the single-device program."""
    _parity("ssd_mobilenet_v1_coco", build_pipeline_mesh(2), batch=4,
            atol=1e-4)


def test_folded_producer_result_survives_partition():
    """A Result fed by a compile-time-folded producer (ShapeOf → Result)
    must still come out of the pipelined network — it has no runtime
    producer stage, so it rides the last stage with its folded chain.
    [Review regression: it used to be silently dropped.]"""
    from pyopenvino_tpu.ir.builder import GraphBuilder

    rng = np.random.default_rng(0)
    b = GraphBuilder("shape_out")
    x = b.parameter("in", (1, 4, 16, 16))
    w1 = rng.normal(0, 0.3, (8, 4, 3, 3)).astype(np.float32)
    y = b.relu(b.conv2d(x, b.const(w1), pads=((1, 1), (1, 1))))
    w2 = rng.normal(0, 0.3, (8, 8, 3, 3)).astype(np.float32)
    z = b.conv2d(y, b.const(w2), pads=((1, 1), (1, 1)))
    b.result(z, name="act_out")
    b.result(b.unary("ShapeOf", z), name="shape_out")
    model = b.build()

    blob = rng.normal(0, 1, (4, 4, 16, 16)).astype(np.float32)
    ref = compile_model(model).infer_batch({"in": blob})
    pp = compile_pipelined(model, build_pipeline_mesh(2))
    out = pp.infer_batch({"in": blob})
    assert set(out) == set(ref) == {"act_out", "shape_out"}
    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-4, atol=1e-5)


def test_generator_calibration_samples_not_exhausted():
    """calibration_samples may be a one-shot generator even when BOTH
    calibration and bias correction iterate it (prepare_model
    materializes it once).  [Review regression.]"""
    from tests.conftest import model_paths

    xml, binp = model_paths("mnist")
    model = read_ir_model(xml, binp)
    rng = np.random.default_rng(1)

    def gen():
        for _ in range(3):
            yield {"conv2d_input": rng.uniform(
                0, 255, (1, 1, 28, 28)).astype(np.float32)}

    net = compile_model(
        model,
        Config(quant=QuantMode.INT8_FULL, bias_correction=True),
        calibration_samples=gen(),
    )
    out = net({"conv2d_input": np.zeros((1, 1, 28, 28), np.float32)})
    assert next(iter(out.values())).shape == (1, 10)


def test_ocr_ti_pp2():
    """The TensorIterator family through the pipeline partitioner: the TI
    nodes land whole inside a stage (a subgraph op is one runtime node)
    and the SPMD ring schedule matches the single-device compiled path."""
    _parity("ocr-ti", build_pipeline_mesh(2), batch=8)
