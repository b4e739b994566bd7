"""The eighth model family: programmatic EfficientNet-B0
(tools/gen_efficientnet.py) — the extension-op capstone.

MBConv blocks with Swish everywhere, 5×5 depthwise stages, and
Squeeze-and-Excitation gates (ReduceMean → 1×1 → Swish → 1×1 → Sigmoid
→ Multiply) — a topology impossible to express in the reference's
21-op set."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


@pytest.fixture(scope="module")
def enet():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("efficientnet-b0")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)


def test_topology(enet):
    # 16 MBConv blocks: one SE gate each → 16 ReduceMean(keep) + 1 GAP;
    # Swish: stem + head + 15 expands (the t=1 first block has none)
    # + 16 depthwise + 16 SE mids = 49.
    assert len(enet.find_by_type("ReduceMean")) == 17
    assert len(enet.find_by_type("GroupConvolution")) == 16
    assert len(enet.find_by_type("Swish")) == 49
    assert len(enet.find_by_type("Sigmoid")) == 16  # SE gates


def test_interpreter_vs_xla(enet, blob):
    ref = Interpreter(enet).run({"data": blob})
    net = compile_model(enet, Config(backend=Backend.XLA))
    got = net.infer({"data": blob})
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == (1, 1000)
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-5)
    assert abs(float(next(iter(got.values())).sum()) - 1.0) < 1e-3


def test_int8_weight_preserves_ranking(enet, blob):
    ref = compile_model(enet, Config()).infer({"data": blob})
    k = next(iter(ref))
    top_ref = int(np.argsort(ref[k][0])[::-1][0])
    net = compile_model(enet, Config(quant=QuantMode.INT8_WEIGHT))
    out = net.infer({"data": blob})
    assert int(np.argsort(out[k][0])[::-1][0]) == top_ref


def test_sharded_dp(enet, blob):
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    net = compile_model(enet, Config())
    ref = net.infer({"data": blob})
    shard_compiled(net, build_mesh(MeshConfig(data=4, model=1)))
    batch = np.repeat(blob, 4, axis=0)
    out = net.infer_batch({"data": batch})
    k = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(out[k][b], ref[k][0], rtol=1e-4,
                                   atol=1e-6)
