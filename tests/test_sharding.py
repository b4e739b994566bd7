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
    assert mesh.shape == {"data": 4, "model": 2, "spatial": 1}
    mesh = build_mesh(MeshConfig(data=2, spatial=4))
    assert mesh.shape == {"data": 2, "model": 1, "spatial": 4}


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


def test_flagship_dp_x_tp_int8w():
    """The flagship GoogLeNet-v1 on the full (data=4, model=2) mesh with
    INT8 weight-only quantization: per-output-channel weight AND scale
    vectors ride P(None, 'model') (parallel/mesh.py _weight_pspec), the
    batch rides P('data') — sharded outputs must match the unsharded
    network per example.  The mnist tests above cover the mechanism; this
    covers the real inception topology (concat joins, 1x1/3x3/5x5
    branches, channel counts not divisible by the mesh everywhere)."""
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("googlenet-v1")
    model = read_ir_model(xml, binp)
    cfg = Config(quant=QuantMode.INT8_WEIGHT)
    compiled = compile_model(model, cfg)

    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)
    ref = compiled.infer({"data": blob})

    mesh = build_mesh(MeshConfig(data=4, model=2))
    shard_compiled(compiled, mesh, tensor_parallel=True)
    batch = np.repeat(blob, 4, axis=0)
    out = compiled.infer_batch({"data": batch})
    name = next(iter(ref))
    for b in range(4):
        np.testing.assert_allclose(
            out[name][b], ref[name][0], rtol=1e-4, atol=1e-6
        )


def test_spatial_parallel_halo_exchange():
    """SP — spatial partitioning, the CNN analogue of sequence/context
    parallelism (SURVEY §5): activations sharded on the image-row axis over
    'spatial', GSPMD inserting the halo exchanges every conv/pool window
    needs.  GoogLeNet on (data=2, spatial=4): output parity per example AND
    the compiled program must actually contain halo collective-permutes
    (otherwise "spatial sharding" silently degraded to all-gathers)."""
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("googlenet-v1")
    compiled = compile_model(read_ir_model(xml, binp))

    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (4, 3, 224, 224)).astype(np.float32)
    ref = compiled.infer_batch({"data": blob})

    mesh = build_mesh(MeshConfig(data=2, spatial=4))
    shard_compiled(compiled, mesh, spatial_parallel=True)
    out = compiled.infer_batch({"data": blob})
    name = next(iter(ref))
    np.testing.assert_allclose(out[name], ref[name], rtol=1e-4, atol=1e-6)

    hlo = compiled.batched_fn(4).lower(
        compiled.weights, {"data": blob}
    ).compile().as_text()
    assert hlo.count("collective-permute") >= 1, "no halo exchange in HLO"


def test_spatial_x_data_combined_distinct_rows():
    """DP x SP on a (2, 1, 2) mesh with DISTINCT batch rows — identical
    rows would mask any cross-example/cross-shard mixing (that is exactly
    how the TP x SP miscompilation below first slipped past a test)."""
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("mnist")
    compiled = compile_model(read_ir_model(xml, binp))
    rng = np.random.default_rng(5)
    blob = rng.uniform(0, 255, (4, 1, 1, 28, 28)).astype(np.float32)
    ref = compiled.infer_batch({"conv2d_input": blob})

    mesh = build_mesh(MeshConfig(data=2, model=1, spatial=2))
    shard_compiled(compiled, mesh, spatial_parallel=True)
    out = compiled.infer_batch({"conv2d_input": blob})
    name = next(iter(ref))
    np.testing.assert_allclose(out[name], ref[name], rtol=1e-4, atol=1e-5)


def test_spatial_x_tensor_rejected():
    """TP x SP is MISCOMPILED by this stack's SPMD partitioner (a conv
    with spatially-sharded input and channel-sharded kernel returns wrong
    values — minimal repro in docs/MEASUREMENTS.md).  shard_compiled must
    refuse the combination instead of silently returning wrong numbers."""
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("mnist")
    compiled = compile_model(read_ir_model(xml, binp))
    mesh = build_mesh(MeshConfig(data=2, model=2, spatial=2))
    with pytest.raises(ValueError, match="cannot be combined"):
        shard_compiled(compiled, mesh, tensor_parallel=True,
                       spatial_parallel=True)


def test_spatial_with_int8_full():
    """SP × INT8-FULL: int8-stored inter-layer edges shard their H axis
    too — the quantized dataflow and halo exchange must compose (distinct
    rows, see above)."""
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("mnist")
    rng = np.random.default_rng(9)
    blob = rng.uniform(0, 255, (4, 1, 1, 28, 28)).astype(np.float32)
    cal = [{"conv2d_input": rng.uniform(0, 255, (1, 1, 28, 28)).astype(
        np.float32)} for _ in range(3)]
    cfg = Config(quant=QuantMode.INT8_FULL)
    ref = compile_model(read_ir_model(xml, binp), cfg,
                        calibration_samples=cal).infer_batch(
        {"conv2d_input": blob})

    compiled = compile_model(read_ir_model(xml, binp), cfg,
                             calibration_samples=cal)
    shard_compiled(compiled, build_mesh(MeshConfig(data=2, spatial=2)),
                   spatial_parallel=True)
    out = compiled.infer_batch({"conv2d_input": blob})
    name = next(iter(ref))
    np.testing.assert_allclose(out[name], ref[name], rtol=1e-4, atol=1e-5)


def test_config_declared_spatial_mesh():
    """Config(mesh_data, mesh_spatial) wires SP through compile_model
    without touching the mesh API (the config-system surface)."""
    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model

    xml, binp = model_paths("mnist")
    rng = np.random.default_rng(10)
    blob = rng.uniform(0, 255, (4, 1, 1, 28, 28)).astype(np.float32)
    ref = compile_model(read_ir_model(xml, binp)).infer_batch(
        {"conv2d_input": blob})
    net = compile_model(read_ir_model(xml, binp),
                        Config(mesh_data=2, mesh_spatial=2))
    assert net._spatial_axis == "spatial"
    out = net.infer_batch({"conv2d_input": blob})
    name = next(iter(ref))
    np.testing.assert_allclose(out[name], ref[name], rtol=1e-4, atol=1e-5)


def test_api_level_shard_facade():
    """ExecutableNetwork.shard: the public mesh entry (docs/GUIDE.md) —
    DP x TP via axis sizes, batch parity vs unsharded."""
    import numpy as np

    from pyopenvino_tpu.api import IECore
    from tests.conftest import model_paths

    ie = IECore()
    xml, binp = model_paths("mnist")
    plain = ie.load_network(ie.read_network(xml, binp), "TPU")
    rng = np.random.default_rng(0)
    rows = rng.uniform(0, 255, (8, 1, 28, 28)).astype(np.float32)
    want = plain.infer_batch({"conv2d_input": rows})

    exe = ie.load_network(ie.read_network(xml, binp), "TPU")
    exe.shard(model=2, tensor_parallel=True)
    got = exe.infer_batch({"conv2d_input": rows})
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5)
