"""Regression tests for code-review findings (round 1 full-range review)."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter
from tests.conftest import model_paths


def test_cl_broadcast_with_low_rank_const():
    """A (C,1,1)-shaped per-channel const against a channels-last conv
    output must broadcast per NCHW semantics (previously crashed or
    silently mis-paired axes)."""
    rng = np.random.default_rng(0)
    b = GraphBuilder("bc")
    x = b.parameter("in", (1, 3, 4, 4))
    w = b.const(rng.standard_normal((3, 3, 1, 1)).astype(np.float32))
    y = b.conv2d(x, w)
    c = b.const(rng.standard_normal((3, 1, 1)).astype(np.float32))
    y = b.add(y, c)
    b.result(y)
    m = b.build()
    blob = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
    ref = Interpreter(m).run({"in": blob})
    out = compile_model(m, Config())({"in": blob})
    k = next(iter(ref))
    np.testing.assert_allclose(out[k], ref[k], rtol=1e-5, atol=1e-6)


def test_native_bias_only():
    """bias without scale must still be applied on the native path."""
    from pyopenvino_tpu import native

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
    bias = np.array([10.0, 20.0, 30.0], np.float32)
    got = native.preprocess_batch(imgs, (16, 16), bias=bias)
    want = native._preprocess_numpy(imgs, (16, 16), None, bias)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bf16_checkpoint_roundtrip(tmp_path, mnist_image):
    xml, binp = model_paths("mnist")
    cfg = Config(quant=QuantMode.INT8_WEIGHT, compute_dtype="bfloat16")
    c = compile_model(read_ir_model(xml, binp), cfg)
    p = str(tmp_path / "w.npz")
    c.save_weights(p)
    c2 = compile_model(read_ir_model(xml, binp), cfg)
    c2.load_weights(p)  # previously raised ValueError ('|V2' dtype)
    out = c2({"conv2d_input": mnist_image})
    k = next(iter(out))
    assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]


def test_tp_shards_matmul_weights(mnist_image):
    """tensor_parallel must shard FC (MatMul) weights, not just convs."""
    from pyopenvino_tpu.parallel import MeshConfig, build_mesh, shard_compiled

    xml, binp = model_paths("mnist")
    m = read_ir_model(xml, binp)
    c = compile_model(m, Config())
    shard_compiled(c, build_mesh(MeshConfig(data=1, model=2)),
                   tensor_parallel=True)
    matmul_weight_keys = set()
    for node in c.model.find_by_type("MatMul"):
        src, _ = c.model.in_edges[node.id][1]
        matmul_weight_keys.add(str(src))
    sharded = {
        k for k, v in c.weights.items()
        if not v.sharding.is_fully_replicated
    }
    assert matmul_weight_keys & sharded, "no MatMul weight got sharded"
    out = c({"conv2d_input": mnist_image})
    k = next(iter(out))
    assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]


def test_config_mesh_knobs_build_mesh(mnist_image):
    """Config(mesh_data=2) must actually shard (previously a silent no-op)."""
    c = compile_model(
        read_ir_model(*model_paths("mnist")), Config(mesh_data=2)
    )
    assert c.mesh is not None and c.mesh.shape["data"] == 2
    batch = np.repeat(mnist_image.reshape(1, 1, 28, 28), 4, axis=0)
    out = c.infer_batch({"conv2d_input": batch})
    k = next(iter(out))
    for i in range(4):
        assert list(np.argsort(out[k][i])[::-1][:3]) == [2, 0, 1]


def test_quantize_skips_conflicting_shared_const():
    """A const feeding two MatMuls with opposite transpose_b has no single
    per-channel axis — must stay float."""
    from pyopenvino_tpu.passes.quantize import quantize_weights

    rng = np.random.default_rng(2)
    b = GraphBuilder("q")
    x = b.parameter("in", (4, 4))
    w = b.const(rng.standard_normal((4, 4)).astype(np.float32), "shared")
    y1 = b.matmul(x, w, transpose_b=False)
    y2 = b.matmul(x, w, transpose_b=True)
    b.result(b.add(y1, y2))
    m = b.build()
    shared_id = next(n.id for n in m.find_by_type("Const")
                     if n.name == "shared")
    q = quantize_weights(m)
    assert shared_id not in q
