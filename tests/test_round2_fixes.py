"""Round-2 advisor/parity fixes.

Covers: folded.* weight keys under tensor-parallel sharding (ADVICE r1
medium), the reference's (prec, dims, ndarray) expected_result tuple form
(reference common_def.py:71-101), and the replay tool's emit context.
"""

import subprocess
import sys

import numpy as np
import pytest

from pyopenvino_tpu import Config, IECore
from pyopenvino_tpu.config import Backend
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from tests.conftest import model_paths


def test_weight_pspec_skips_folded_keys():
    """shard_compiled(tensor_parallel=True) must not int() 'folded.*' keys."""
    from jax.sharding import PartitionSpec as P

    from pyopenvino_tpu.parallel.mesh import _weight_pspec

    xml, binp = model_paths("mnist")
    model = read_ir_model(xml, binp)
    spec = _weight_pspec(model, "folded.42.0", np.zeros((8, 128)), 2)
    assert spec == P()


def test_tensor_parallel_with_synthetic_folded_key():
    """End-to-end: inject a folded.* entry into the weight pytree and shard."""
    from pyopenvino_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_compiled,
    )

    xml, binp = model_paths("mnist")
    c = compile_model(read_ir_model(xml, binp), Config(backend=Backend.XLA))
    import jax.numpy as jnp

    c.weights["folded.9999.0"] = jnp.zeros((4, 4), jnp.float32)
    mesh = build_mesh(MeshConfig(data=4, model=2))
    shard_compiled(c, mesh, tensor_parallel=True)  # must not raise
    del c.weights["folded.9999.0"]


@pytest.mark.parametrize("device", ["CPU", "TPU"])
def test_expected_result_tuple_form(device, mnist_image):
    """Reference tuple records {name: (prec, dims, ndarray)} accepted on
    both the interpreter and compiled paths."""
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, device)
    conv = next(n for n in net.model if n.op_type == "Convolution")

    # golden value: the node's activation from the compiled capture path
    c = compile_model(read_ir_model(xml, binp), Config(backend=Backend.XLA))
    golden = c.capture_activations({"conv2d_input": mnist_image}, [conv.name])[
        conv.name
    ]

    exe.expected_result = {
        conv.name: ("FP32", tuple(golden.shape), golden)
    }
    exe.infer({"conv2d_input": mnist_image})
    assert exe.last_compare_failures == []

    # corrupt the golden → must be flagged
    exe.expected_result = {
        conv.name: ("FP32", tuple(golden.shape), golden + 1e3)
    }
    exe.infer({"conv2d_input": mnist_image})
    assert exe.last_compare_failures == [conv.name]


def test_replay_node_capture_and_replay(tmp_path):
    """tools/replay_node.py capture→replay on a Convolution node exits 0
    (the replay _Ctx previously lacked pallas_interpret/act_scale)."""
    import os

    fixture = str(tmp_path / "fixtures.pkl")
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r1 = subprocess.run(
        [sys.executable, "tools/replay_node.py", "capture", "--model",
         "mnist", "--nodes", "2", "--out", fixture],
        capture_output=True, text=True, cwd=root, env=env, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run(
        [sys.executable, "tools/replay_node.py", "replay", fixture],
        capture_output=True, text=True, cwd=root, env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "MATCH" in r2.stdout


def test_server_stats_percentile_concurrent():
    """percentile() snapshots safely while another thread appends."""
    import threading

    from pyopenvino_tpu.serving.server import ServerStats

    stats = ServerStats()
    stop = threading.Event()

    def writer():
        i = 0
        while not stop.is_set():
            stats.latencies_ms.append(float(i % 100))
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(200):
            p = stats.percentile(99)
            assert p >= 0.0
    finally:
        stop.set()
        t.join()
