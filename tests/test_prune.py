"""Dead-branch elimination (passes/util.py prune_dead_nodes).

The compiled path prunes nodes that reach no Result (e.g. a
training-time auxiliary head left in an exported IR); the numpy
Interpreter deliberately executes every node like the reference
(inference_engine.py:259-292), so the two must still agree on the live
outputs."""

import numpy as np

from pyopenvino_tpu.config import Config
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.passes.util import prune_dead_nodes
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


def _graph_with_dead_branch():
    rng = np.random.default_rng(0)
    b = GraphBuilder("dead_branch")
    x = b.parameter("in", (1, 4, 8, 8))
    w = rng.normal(0, 0.3, (8, 4, 3, 3)).astype(np.float32)
    live = b.relu(b.conv2d(x, b.const(w), pads=((1, 1), (1, 1))))
    # dead: a second conv + relu whose output feeds nothing
    wd = rng.normal(0, 0.3, (16, 4, 3, 3)).astype(np.float32)
    b.relu(b.conv2d(x, b.const(wd), pads=((1, 1), (1, 1))))
    b.result(live, name="out")
    return b.build()


def test_prune_drops_exactly_the_dead_branch():
    m = _graph_with_dead_branch()
    pruned, dropped = prune_dead_nodes(m)
    assert dropped == 3  # dead conv, its weight const, dead relu
    assert len(pruned.find_by_type("Convolution")) == 1
    assert len(pruned.parameters) == 1  # parameters always survive


def test_prune_is_identity_on_fully_live_graph():
    m = _graph_with_dead_branch()
    pruned, _ = prune_dead_nodes(m)
    again, dropped = prune_dead_nodes(pruned)
    assert dropped == 0 and again is pruned


def test_compiled_prunes_but_matches_unpruned_interpreter():
    m = _graph_with_dead_branch()
    blob = np.random.default_rng(1).normal(
        0, 1, (1, 4, 8, 8)).astype(np.float32)
    ref = Interpreter(m).run({"in": blob})  # executes the dead branch too
    c = compile_model(m, Config())
    got = c.infer({"in": blob})
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-6)
    # the dead conv's 16-channel weight never reaches the device pytree
    four_d = [v for v in c.weights.values() if np.asarray(v).ndim == 4]
    assert len(four_d) == 1 and four_d[0].shape[-1] != 16
