"""IR front-end tests: layer/edge counts and const decoding against the
shipped models (counts cross-checked with SURVEY.md §2.3 op census)."""

import numpy as np
import pytest

from tests.conftest import MODEL_NAMES

EXPECTED_LAYERS = {
    "mnist": 33,
    "mnist_bn": 51,
    "googlenet-v1": 323,
    "ssd_mobilenet_v1_coco": 366,
}


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_layer_counts(loaded, name):
    model = loaded(name)
    assert len(model.nodes) == EXPECTED_LAYERS[name]


def test_mnist_structure(loaded):
    model = loaded("mnist")
    assert len(model.find_by_type("Convolution")) == 3
    assert len(model.find_by_type("MatMul")) == 2
    assert len(model.parameters) == 1
    assert len(model.results) == 1
    assert model.parameters[0].name == "conv2d_input"
    # first conv weight const decodes to the declared shape/dtype
    const = model.nodes[1]
    assert const.op_type == "Const"
    assert const.const is not None
    assert const.const.shape == (32, 1, 3, 3)
    assert const.const.dtype == np.float32
    # real weights, not garbage
    assert np.isfinite(const.const).all()
    assert 0 < np.abs(const.const).max() < 100


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_topo_order_respects_edges(loaded, name):
    model = loaded(name)
    pos = {nid: i for i, nid in enumerate(model.topo_order())}
    for e in model.edges:
        assert pos[e.src] < pos[e.dst]


def test_edge_connectivity(loaded):
    model = loaded("mnist")
    # every non-Parameter/Const node has all declared input ports wired
    for node in model:
        if node.op_type in ("Parameter", "Const"):
            continue
        assert set(model.in_edges[node.id]) == set(node.inputs), node


def test_all_ops_supported(loaded):
    from pyopenvino_tpu.ops import supported_ops

    supported = set(supported_ops())
    for name in MODEL_NAMES:
        types = {n.op_type for n in loaded(name).nodes.values()}
        assert types <= supported, types - supported


def test_extract_subgraph(loaded, mnist_image):
    """Cutting at an intermediate node yields a runnable sub-model whose
    output equals the full model's activation at that node."""
    import numpy as np

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir.model import extract_subgraph
    from pyopenvino_tpu.runtime.compiler import compile_model

    model = loaded("mnist")
    cut = next(n for n in model if n.op_type == "MaxPool").name
    sub = extract_subgraph(model, [cut])
    assert len(sub.nodes) < len(model.nodes)

    full = compile_model(model, Config())
    acts = full.capture_activations({"conv2d_input": mnist_image}, [cut])
    out = compile_model(sub, Config())({"conv2d_input": mnist_image})
    np.testing.assert_allclose(
        out[f"{cut}/cut"], acts[cut], rtol=1e-5, atol=1e-6
    )
