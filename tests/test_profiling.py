"""Compiled-path profiling tests (runtime/profiling.py).

On the CPU test backend the XLA device plane is absent, so hlo_stats
yields no rows — these tests cover the parse/aggregate machinery with a
synthetic row set plus the end-to-end API surface (graceful empty result,
named-scope emission compiling fine).  The measured-on-TPU table is driven
by `python tools/inspect.py --device tpu --profile` (docs/MEASUREMENTS.md).
"""

import numpy as np

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime import profiling
from pyopenvino_tpu.runtime.compiler import compile_model
from tests.conftest import model_paths

ROWS = [
    {"category": "convolution", "hlo_op": "fusion.1",
     "framework_op": "jit(fn)/Convolution_5/conv_general_dilated:",
     "occurrences": 2, "self_us": 100.0, "bound_by": "Compute"},
    {"category": "convolution", "hlo_op": "fusion.2",
     "framework_op": "jit(fn)/Convolution_9/conv_general_dilated:",
     "occurrences": 1, "self_us": 50.0, "bound_by": "HBM"},
    {"category": "loop fusion", "hlo_op": "fusion.3",
     "framework_op": "jit(fn)/MaxPool_7/reduce_window:",
     "occurrences": 1, "self_us": 25.0, "bound_by": "HBM"},
    {"category": "copy", "hlo_op": "copy.1", "framework_op": "",
     "occurrences": 3, "self_us": 25.0, "bound_by": "HBM"},
]


def test_aggregate_by_category():
    agg = profiling.aggregate(ROWS, "category")
    assert agg[0]["category"] == "convolution"
    assert agg[0]["self_us"] == 150.0
    assert agg[0]["pct"] == 75.0
    assert agg[0]["bound_by"] == "Compute"  # 100 Compute > 50 HBM
    total_pct = sum(r["pct"] for r in agg)
    assert abs(total_pct - 100.0) < 0.1


def test_aggregate_by_node_scope():
    agg = profiling.aggregate(ROWS, "node")
    keys = [r["node"] for r in agg]
    assert keys[0] == "Convolution_5"
    assert "(unattributed)" in keys  # the bare copy row
    assert profiling.node_scope(ROWS[2]) == "MaxPool_7"


def test_format_table_runs():
    out = profiling.format_table(profiling.aggregate(ROWS, "category"))
    assert "convolution" in out and "75.00" in out


def test_profile_api_graceful_on_cpu(mnist_image):
    """profile() with named-scope emission compiles and returns a list
    (empty on the CPU backend — no device plane)."""
    xml, binp = model_paths("mnist")
    c = compile_model(read_ir_model(xml, binp), Config(backend=Backend.XLA))
    rows = c.profile({"conv2d_input": mnist_image})
    assert isinstance(rows, list)


def test_parse_hlo_stats_missing_dir(tmp_path):
    assert profiling.parse_hlo_stats(str(tmp_path)) == []
