"""Async InferRequest pool + compiled-path per-layer debugging tests."""

import numpy as np
import pytest

from pyopenvino_tpu import Config, IECore
from pyopenvino_tpu.config import Backend
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from tests.conftest import model_paths


@pytest.fixture(scope="module")
def mnist_compiled():
    xml, binp = model_paths("mnist")
    return compile_model(read_ir_model(xml, binp), Config(backend=Backend.XLA))


def test_capture_activations(mnist_compiled, mnist_image):
    names = [
        n.name for n in mnist_compiled.model
        if n.op_type == "Convolution"
    ]
    acts = mnist_compiled.capture_activations(
        {"conv2d_input": mnist_image}, names
    )
    assert set(acts) == set(names)
    for name, arr in acts.items():
        assert arr.ndim == 4 and np.all(np.isfinite(arr))


def test_verify_against_interpreter_passes(mnist_compiled, mnist_image):
    diffs = mnist_compiled.verify_against_interpreter(
        {"conv2d_input": mnist_image}
    )
    assert diffs and max(diffs.values()) < 1e-3


def test_verify_catches_divergence(mnist_image):
    """Corrupt one weight after compile → the per-layer check must fail."""
    xml, binp = model_paths("mnist")
    c = compile_model(read_ir_model(xml, binp), Config(backend=Backend.XLA))
    # perturb a conv weight in the device pytree only (interpreter still
    # reads the pristine node.const)
    key = next(
        k for k, v in c.weights.items()
        if np.asarray(v).ndim == 4
    )
    c.weights[key] = c.weights[key] + 1.0
    with pytest.raises(AssertionError):
        c.verify_against_interpreter({"conv2d_input": mnist_image})


def test_async_request_pool(mnist_image):
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU", num_requests=3)
    try:
        reqs = exe.requests
        assert len(reqs) == 3
        for r in reqs:
            r.start_async({"conv2d_input": mnist_image})
        for r in reqs:
            assert r.wait(timeout=120) == 0
        for r in reqs:
            k = next(iter(r.output_blobs))
            assert list(np.argsort(r.output_blobs[k][0])[::-1][:3]) == [2, 0, 1]
    finally:
        exe.close()


def test_double_start_async_raises(mnist_image):
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU", num_requests=1)
    try:
        import concurrent.futures

        r = exe.requests[0]
        r.start_async({"conv2d_input": mnist_image})
        # Starting again while in flight must be rejected.  The real
        # future may complete at any moment (TOCTOU), so substitute a
        # never-done future to make the rejection path deterministic.
        real = r._future
        r._future = concurrent.futures.Future()
        try:
            with pytest.raises(RuntimeError):
                r.start_async({"conv2d_input": mnist_image})
        finally:
            r._future = real
        r.wait(timeout=120)
    finally:
        exe.close()


def test_expected_result_on_compiled_backend(mnist_image):
    """The reference's golden-comparison hook works on compiled backends
    too (not just the interpreter)."""
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU")
    name = next(
        n.name for n in net.model if n.op_type == "Convolution"
    )
    # golden = the interpreter's own activation
    from pyopenvino_tpu.runtime.compiler import compile_model

    c = compile_model(net.model, Config())
    golden = c.capture_activations({"conv2d_input": mnist_image}, [name])

    exe.expected_result = {name: golden[name]}
    exe.infer({"conv2d_input": mnist_image})
    assert exe.last_compare_failures == []

    exe.expected_result = {name: golden[name] + 1e3}
    exe.infer({"conv2d_input": mnist_image})
    assert exe.last_compare_failures == [name]


def test_infer_batch_honors_interpreter_backend(mnist_image):
    """kernel_type='numpy' must keep infer_batch off the compiled path
    (the point of choosing the interpreter), with the same output
    contract: (B,) + result shape sans the declared unit batch."""
    import numpy as np

    from __graft_entry__ import _model_paths
    from pyopenvino_tpu import IECore

    ie = IECore()
    net = ie.read_network(*_model_paths("mnist"))
    exe = ie.load_network(net, "TPU")
    batch = np.repeat(mnist_image.reshape(1, 1, 1, 28, 28), 3, axis=0)
    a = exe.infer_batch({"conv2d_input": batch})
    exe.kernel_type = "numpy"
    assert exe.backend.value == "interpreter"
    b = exe.infer_batch({"conv2d_input": batch})
    for k in a:
        assert a[k].shape == b[k].shape
        np.testing.assert_allclose(a[k], b[k], rtol=1e-3, atol=1e-5)


def test_perf_counts_interpreter(mnist_image):
    """OpenVINO get_perf_counters parity on the interpreter backend: per-
    layer measured wall-clock of the last infer (the reference prints the
    same from its dispatch loop, inference_engine.py:273-283)."""
    ie = IECore()
    xml, binp = model_paths("mnist")
    exe = ie.load_network(ie.read_network(xml, binp), "CPU")
    with pytest.raises(RuntimeError, match="infer"):
        exe.get_perf_counts()  # nothing ran yet
    exe.infer({"conv2d_input": mnist_image})
    counts = exe.get_perf_counts()
    # the interpreter times every task incl. Const/Parameter/Result — the
    # same coverage as the reference's dispatch-loop printout
    runtime_layers = [
        n for n in exe.ienet.model
        if n.op_type not in ("Const", "Parameter", "Result")
    ]
    assert {n.name for n in runtime_layers} <= set(counts)
    for name, row in counts.items():
        assert row["status"] == "EXECUTED"
        assert row["real_time_us"] >= 0.0
        assert row["layer_type"]
    total = sum(r["real_time_us"] for r in counts.values())
    assert total > 0.0


def test_perf_counts_compiled_contract(mnist_image):
    """Compiled-path perf counts require inputs (they profile a real
    execution) and refuse to fabricate numbers off-TPU (the CPU backend
    has no device plane — an empty profile must raise, not report every
    layer NOT_RUN)."""
    ie = IECore()
    xml, binp = model_paths("mnist")
    exe = ie.load_network(ie.read_network(xml, binp), "TPU")
    with pytest.raises(ValueError, match="inputs"):
        exe.get_perf_counts()
    with pytest.raises(RuntimeError, match="device plane|empty"):
        exe.get_perf_counts({"conv2d_input": mnist_image})


def test_query_network():
    """IECore.query_network parity: supported layers map to the device;
    unsupported ones are omitted (how QueryNetworkResult is consumed)."""
    from pyopenvino_tpu.ir.model import Model, Node

    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    supported = ie.query_network(net, "TPU")
    assert set(supported.values()) == {"TPU"}
    all_names = {n.name for n in net.model.nodes.values()}
    assert set(supported) == all_names  # every mnist layer is supported

    bogus = Node(id=0, name="alien", op_type="FancyNewOp", attrs={},
                 inputs={}, outputs={})
    holey = ie.read_network(xml, binp)
    holey.model.nodes[max(holey.model.nodes) + 1] = bogus
    res = ie.query_network(holey, "TPU")
    assert "alien" not in res
