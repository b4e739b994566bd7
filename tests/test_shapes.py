"""Shape-inference parity: our op semantics must reproduce every declared
port dim in all four shipped model XMLs (SURVEY.md §7 hard part 2 — the IR
declares every port's dims, so shape inference is fully checkable)."""

import pytest

from pyopenvino_tpu.passes.shape_infer import check_against_declared, infer_shapes
from tests.conftest import MODEL_NAMES


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_shapes_match_declared(loaded, name):
    model = loaded(name)
    analysis = infer_shapes(model)
    check_against_declared(model, analysis)


def test_ssd_folds_to_anchors(loaded):
    """The ShapeOf→StridedSlice→PriorBoxClustered→Concat subgraphs of SSD
    must be fully statically evaluated (SURVEY.md §3.5)."""
    model = loaded("ssd_mobilenet_v1_coco")
    analysis = infer_shapes(model)
    do = model.find_by_type("DetectionOutput")[0]
    src, sport = model.in_edges[do.id][2]  # proposals input
    anchors = analysis.value(src, sport)
    assert anchors is not None, "anchors were not constant-folded"
    assert anchors.shape == (1, 2, 7668)


def test_padding_modes():
    from pyopenvino_tpu.ops.padding import resolve_padding_2d

    # same_upper: out = ceil(in/s), extra pad goes to the end
    p = resolve_padding_2d((300, 300), (3, 3), (2, 2), (1, 1), (0, 0), (0, 0),
                           "same_upper", "floor")
    assert (p.out_h, p.out_w) == (150, 150)
    assert p.pad_top <= p.pad_bottom and p.pad_left <= p.pad_right
    # valid
    p = resolve_padding_2d((28, 28), (3, 3), (1, 1), (1, 1), (9, 9), (9, 9),
                           "valid", "floor")
    assert (p.out_h, p.out_w) == (26, 26)
    assert p.pad_top == p.pad_bottom == 0
    # ceil rounding grows the output and extends end padding
    p = resolve_padding_2d((28, 28), (3, 3), (2, 2), (1, 1), (0, 0), (0, 0),
                           "explicit", "ceil")
    assert (p.out_h, p.out_w) == (14, 14)
    assert p.pad_bottom >= 1
