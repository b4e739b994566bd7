"""Sharding fuzzer: random graph × random mesh parity.

The TP×SP partitioner miscompile (parallel/mesh.py shard_compiled,
docs/MEASUREMENTS.md "Backend-specific findings") was caught by a single
hand-written distinct-row check — this generalizes that coverage: every
seed builds a fresh random DAG (tests/test_fuzz_differential.py's
generator) and runs it batched under a seed-chosen mesh configuration
(DP / DP×TP / TP / DP×SP / SP / DP×TP-with-EP-weights), asserting parity
against the unsharded single-device run on DISTINCT batch rows — a
repeated-row batch masked the original TP×SP wrong-answer, so rows here
are all different by construction.

CI runs a fixed seed set; larger offline sweeps are recorded in
docs/MEASUREMENTS.md (run: FUZZ_SHARDING_SEEDS=200 pytest
tests/test_fuzz_sharding.py -q).
"""

import os

import numpy as np
import pytest

from pyopenvino_tpu.ir.builder import GraphBuilder  # noqa: F401 (generator dep)
from pyopenvino_tpu.parallel.mesh import MeshConfig, build_mesh, shard_compiled
from pyopenvino_tpu.runtime.compiler import compile_model
from tests.test_fuzz_differential import _random_graph

# (name, mesh axes, shard_compiled kwargs) — every legal mode/composition
# on 8 virtual devices.  TP×SP is the documented refusal
# (test_sharding.py::test_tp_sp_refused pins it).
MESH_CASES = [
    ("dp8", MeshConfig(data=8), {}),
    ("dp4_tp2", MeshConfig(data=4, model=2), {"tensor_parallel": True}),
    ("tp2", MeshConfig(data=1, model=2), {"tensor_parallel": True}),
    ("dp2_sp2", MeshConfig(data=2, spatial=2), {"spatial_parallel": True}),
    ("sp4", MeshConfig(data=1, spatial=4), {"spatial_parallel": True}),
    ("dp2_tp2", MeshConfig(data=2, model=2), {"tensor_parallel": True}),
]


def _check_seed(seed: int):
    model, in_name, in_shape = _random_graph(seed)
    rng = np.random.default_rng(seed + 5000)
    batch = 8  # divisible by every 'data' axis above
    # DISTINCT rows: a repeated-row batch is sharding-parity-blind
    blob = rng.normal(0, 1, (batch,) + in_shape).astype(np.float32)

    ref = compile_model(model).infer_batch({in_name: blob})

    name, axes, kw = MESH_CASES[seed % len(MESH_CASES)]
    net = compile_model(model)
    shard_compiled(net, build_mesh(axes), **kw)
    got = net.infer_batch({in_name: blob})

    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=1e-4, atol=1e-5,
            err_msg=f"seed={seed} mesh={name} output {k!r}",
        )


@pytest.mark.parametrize("seed", range(12))
def test_random_graph_random_mesh_parity(seed):
    _check_seed(seed)


def test_offline_sweep():
    """FUZZ_SHARDING_SEEDS=N widens the sweep beyond the CI set (receipts
    in docs/MEASUREMENTS.md); skipped in normal runs."""
    n = int(os.environ.get("FUZZ_SHARDING_SEEDS", "0"))
    if n <= 12:
        pytest.skip("offline sweep only (set FUZZ_SHARDING_SEEDS)")
    failures = []
    for seed in range(12, n):
        try:
            _check_seed(seed)
        except Exception as e:  # collected: one bad seed must not end a sweep
            failures.append((seed, repr(e)[:200]))
        if seed % 25 == 0:
            print(f"sweep at seed {seed}, {len(failures)} failures")
    assert not failures, failures
