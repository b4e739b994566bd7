"""Multi-chip sharding tests over the 8 virtual CPU devices (conftest sets
--xla_force_host_platform_device_count=8).  Validates the DP/TP capabilities
the reference lacks entirely (SURVEY.md §2.4)."""

import numpy as np
import pytest

from pyopenvino_tpu import IECore
from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled
from tests.conftest import model_paths


@pytest.fixture(scope="module")
def mnist_exe():
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    return ie.load_network(net, "TPU"), net


def test_mesh_build():
    import jax

    assert len(jax.devices()) >= 8
    mesh = build_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_data_parallel_batch(mnist_exe, mnist_image):
    exe, net = mnist_exe
    compiled = exe._get_compiled()
    ref = compiled.infer({"conv2d_input": mnist_image})

    mesh = build_mesh(MeshConfig(data=8, model=1))
    shard_compiled(compiled, mesh, tensor_parallel=False)

    batch = np.repeat(mnist_image.reshape(1, 1, 28, 28), 8, axis=0)
    out = compiled.infer_batch({"conv2d_input": batch})
    name = net.outputs[0]["name"]
    assert out[name].shape[0] == 8
    for b in range(8):
        np.testing.assert_allclose(out[name][b], ref[name][0], rtol=1e-4, atol=1e-6)


def test_tensor_parallel_weights(mnist_image):
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU")
    compiled = exe._get_compiled()
    ref = compiled.infer({"conv2d_input": mnist_image})

    mesh = build_mesh(MeshConfig(data=1, model=2))
    shard_compiled(compiled, mesh, tensor_parallel=True)

    # at least one conv weight actually got channel-sharded
    sharded = [
        k
        for k, v in compiled.weights.items()
        if not v.sharding.is_fully_replicated
    ]
    assert sharded, "tensor_parallel placed no sharded weights"

    out = compiled.infer({"conv2d_input": mnist_image})
    name = net.outputs[0]["name"]
    np.testing.assert_allclose(out[name], ref[name], rtol=1e-4, atol=1e-6)


def test_dp_x_tp_combined(mnist_image):
    ie = IECore()
    xml, binp = model_paths("mnist")
    net = ie.read_network(xml, binp)
    exe = ie.load_network(net, "TPU")
    compiled = exe._get_compiled()
    ref = compiled.infer({"conv2d_input": mnist_image})

    mesh = build_mesh(MeshConfig(data=4, model=2))
    shard_compiled(compiled, mesh, tensor_parallel=True)
    batch = np.repeat(mnist_image.reshape(1, 1, 28, 28), 4, axis=0)
    out = compiled.infer_batch({"conv2d_input": batch})
    name = net.outputs[0]["name"]
    for b in range(4):
        np.testing.assert_allclose(out[name][b], ref[name][0], rtol=1e-4, atol=1e-6)
