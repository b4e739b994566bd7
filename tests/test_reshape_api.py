"""IENetwork.reshape (input-shape change before load) and the
OpenVINO 2.0-style Core/CompiledModel facade — API surface the
reference never had (its shapes are frozen into the XML and it
implements only the legacy IECore spelling)."""

import numpy as np
import pytest

from pyopenvino_tpu import Core, IECore


def _unet_paths():
    from __graft_entry__ import _model_paths

    return _model_paths("unet")


def test_reshape_resolution_and_batch():
    ie = IECore()
    net = ie.read_network(*_unet_paths())
    assert net.inputs[0]["shape"] == (1, 3, 128, 128)
    net.reshape({"data": (2, 3, 160, 160)})
    assert net.inputs[0]["shape"] == (2, 3, 160, 160)
    assert net.outputs[0]["shape"] == (2, 8, 160, 160)
    # every declared port was re-derived, not just the endpoints
    from pyopenvino_tpu.passes.shape_infer import (
        check_against_declared, infer_shapes,
    )

    check_against_declared(net.model, infer_shapes(net.model))

    exe = ie.load_network(net, "CPU")
    blob = np.random.default_rng(0).uniform(
        0, 255, (2, 3, 160, 160)).astype(np.float32)
    out = exe.infer({"data": blob})
    assert next(iter(out.values())).shape == (2, 8, 160, 160)


def test_reshape_interpreter_vs_xla_at_new_resolution():
    from pyopenvino_tpu.config import Backend, Config
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    ie = IECore()
    net = ie.read_network(*_unet_paths()).reshape({"data": (1, 3, 96, 96)})
    blob = np.random.default_rng(1).uniform(
        0, 255, (1, 3, 96, 96)).astype(np.float32)
    ref = Interpreter(net.model).run({"data": blob})
    got = compile_model(net.model, Config(backend=Backend.XLA)).infer(
        {"data": blob})
    k = next(iter(ref))
    np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)


def test_reshape_failure_contracts():
    from __graft_entry__ import _model_paths

    ie = IECore()
    net = ie.read_network(*_model_paths("mnist"))
    # fixed flatten target cannot absorb a new resolution — the op's
    # own shape error surfaces (real-engine contract)
    with pytest.raises(Exception, match="(?i)reshape"):
        net.reshape({"conv2d_input": (1, 1, 56, 56)})
    # unknown input name fails fast with the valid names listed
    net2 = ie.read_network(*_unet_paths())
    with pytest.raises(ValueError, match="not Parameter inputs"):
        net2.reshape({"nope": (1, 3, 128, 128)})


def test_ov2_core_facade():
    core = Core()
    model = core.read_model(*_unet_paths())
    model.reshape({"data": (1, 3, 64, 64)})
    compiled = core.compile_model(model, "CPU")
    blob = np.random.default_rng(2).uniform(
        0, 255, (1, 3, 64, 64)).astype(np.float32)
    out = compiled({"data": blob})             # callable form
    assert next(iter(out.values())).shape == (1, 8, 64, 64)
    out2 = compiled.infer_new_request({"data": blob})
    k = next(iter(out))
    np.testing.assert_allclose(out2[k], out[k])
    req = compiled.create_infer_request()
    got = req.infer({"data": blob})
    # the request path rides the continuous-batching server (the vmap'd
    # program) — a different but equivalent XLA executable
    np.testing.assert_allclose(got[k], out[k], rtol=1e-4, atol=1e-5)


# -- bake_batch (throughput batch baking, passes/shape_infer.py) --------------

def test_bake_batch_matches_vmap_batching():
    """compile_model(bake_batch=B) must produce exactly what the vmap
    batching path produces — same graph, batch in the shapes instead of
    a vmap axis (GoogLeNet +17% on chip, docs/MEASUREMENTS.md)."""
    import numpy as np

    from tests.conftest import model_paths

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("mnist")
    B = 4
    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (B, 1, 28, 28)).astype(np.float32)
    net_v = compile_model(read_ir_model(xml, binp), Config())
    ref = net_v.infer_batch({"conv2d_input": blob})
    net_b = compile_model(read_ir_model(xml, binp), Config(), bake_batch=B)
    name = net_b.model.parameters[0].name
    got = net_b.infer({name: blob})
    assert net_b.model.parameters[0].outputs[0].shape[0] == B
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]).reshape(ref[k].shape), ref[k],
            rtol=1e-4, atol=1e-4)


def test_bake_batch_rejects_batch_dropping_graphs():
    """A Reshape that drops the batch dim (SSD's box decode) has no baked
    realization — the rederive raises the op's own shape error instead of
    silently mis-batching."""
    import numpy as np
    import pytest

    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.passes.shape_infer import bake_batch

    b = GraphBuilder("drop")
    x = b.parameter("x", (1, 12))
    y = b.reshape(x, (3, 4))  # batch dim folded away
    b.result(b.relu(y), "out")
    with pytest.raises(ValueError):
        bake_batch(b.build(), 8)


def test_bake_batch_spares_non_batch_unit_reshapes():
    """A Reshape whose leading 1 is NOT the batch (a Reduce-to-(1,1,1,1)
    scalar holder) must survive baking untouched — targets are patched
    only when inference actually fails under the batched Parameters."""
    import numpy as np

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.passes.shape_infer import bake_batch
    from pyopenvino_tpu.runtime.compiler import compile_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    b = GraphBuilder("side")
    x = b.parameter("x", (1, 4, 6, 6))
    g = b.reduce("Mean", x, axes=(0, 1, 2, 3), keep_dims=True)  # (1,1,1,1)
    g = b.reshape(g, (1, 1, 1, 1))       # non-batch unit-leading target
    b.result(b.add(x, g), "out")
    m = b.build()
    B = 8
    baked = bake_batch(m, B)
    rng = np.random.default_rng(0)
    blob = rng.standard_normal((B, 4, 6, 6)).astype(np.float32)
    got = compile_model(baked, Config()).infer({"x": blob})["out"]
    # per the baked graph, the global mean now spans the batch — compare
    # against that semantic directly
    want = blob + blob.mean()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bake_batch_refuses_leading_minus_one_absorber():
    """A Reshape whose -1-leading target would silently absorb the batch
    must raise (the vmap-fallback signal), not change semantics."""
    import numpy as np
    import pytest

    from pyopenvino_tpu.ir.builder import GraphBuilder
    from pyopenvino_tpu.passes.shape_infer import bake_batch

    b = GraphBuilder("ab")
    x = b.parameter("x", (1, 12))
    y = b.reshape(x, (-1, 4))
    b.result(b.relu(y), "out")
    with pytest.raises(ValueError, match="leading -1"):
        bake_batch(b.build(), 8)
