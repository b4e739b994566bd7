"""Full-INT8 (weights + calibrated activations) quantization tests.

Accuracy gate on real shipped MNIST weights: the INT8_FULL path must keep
the golden top-3 ranking [2, 0, 1] (reference: integrity_test.py:57) —
the BASELINE.md "top-1 within 0.5%" gate, checkable only where real
weights exist.
"""

import numpy as np
import pytest

from pyopenvino_tpu import IECore
from pyopenvino_tpu.config import Backend, Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from tests.conftest import model_paths


def _cal_samples(shape, n=4, include=None):
    rng = np.random.default_rng(0)
    out = list(include or [])
    for _ in range(n):
        out.append({
            name: rng.uniform(0, 255, s).astype(np.float32)
            for name, s in shape.items()
        })
    return out


class TestInt8Full:
    @pytest.mark.parametrize("backend", [Backend.XLA, Backend.PALLAS])
    def test_mnist_golden(self, backend, mnist_image):
        xml, binp = model_paths("mnist")
        m = read_ir_model(xml, binp)
        cal = _cal_samples(
            {"conv2d_input": (1, 1, 28, 28)},
            include=[{"conv2d_input": mnist_image}],
        )
        c = compile_model(
            m, Config(backend=backend, quant=QuantMode.INT8_FULL),
            calibration_samples=cal,
        )
        assert len(c.act_scales) >= 4  # 3 convs + matmuls get scales
        out = c({"conv2d_input": mnist_image})
        k = next(iter(out))
        assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]

    def test_googlenet_top1_matches_fp32(self, loaded):
        m = loaded("googlenet-v1")
        rng = np.random.default_rng(1)
        blob = rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)
        cal = [{"data": blob}]
        ref = compile_model(m, Config())({"data": blob})
        c = compile_model(
            m, Config(quant=QuantMode.INT8_FULL), calibration_samples=cal
        )
        out = c({"data": blob})
        k = next(iter(out))
        assert np.argmax(out[k]) == np.argmax(ref[k])

    def test_missing_calibration_rejected(self, loaded):
        with pytest.raises(ValueError, match="calibration"):
            compile_model(loaded("mnist"), Config(quant=QuantMode.INT8_FULL))

    def test_facade_set_calibration(self, mnist_image):
        ie = IECore()
        xml, binp = model_paths("mnist")
        net = ie.read_network(xml, binp)
        exe = ie.load_network(
            net, "TPU", config=Config(quant=QuantMode.INT8_FULL)
        )
        exe.set_calibration([{"conv2d_input": mnist_image}])
        out = exe.infer({"conv2d_input": mnist_image})
        k = next(iter(out))
        assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]


def test_int8_interlayer_storage_edges():
    """INT8-FULL assigns int8 HBM storage to conv->conv edges (the
    quantized dataflow: producer epilogue requantizes, consumer reads int8
    directly) and the stored-path output stays within quantization
    tolerance of fp32."""
    from pyopenvino_tpu.config import Backend, Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    xml, binp = model_paths("ssd_mobilenet_v1_coco")
    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, (1, 3, 300, 300)).astype(np.float32)
    cal = [{"image_tensor": blob}]

    c = compile_model(
        read_ir_model(xml, binp),
        Config(backend=Backend.XLA, quant=QuantMode.INT8_FULL),
        calibration_samples=cal,
    )
    # the MobileNet trunk is conv->dw->conv chains: many edges qualify
    assert len(c._int8_edges) >= 20, len(c._int8_edges)

    ref = compile_model(
        read_ir_model(xml, binp), Config(backend=Backend.XLA)
    )({"image_tensor": blob})
    got = c({"image_tensor": blob})
    r = next(iter(ref.values())).reshape(-1, 7)
    g = next(iter(got.values())).reshape(-1, 7)
    assert r[0, 1] == g[0, 1]          # top detection class preserved
    assert abs(r[0, 2] - g[0, 2]) < 0.05


def test_int8_dataflow_carries_googlenet(loaded):
    """The extended INT8 dataflow stores edges whose consumers are pools,
    LRNs and concats (carry/accepter propagation), not just conv->conv:
    the GoogLeNet stem (conv-pool-LRN-conv) and every inception join must
    travel HBM as int8, and top-1 must still match fp32."""
    m = loaded("googlenet-v1")
    rng = np.random.default_rng(3)
    blob = rng.uniform(0, 255, (1, 3, 224, 224)).astype(np.float32)
    c = compile_model(
        m, Config(quant=QuantMode.INT8_FULL), calibration_samples=[{"data": blob}]
    )
    by_type = {}
    for (src, sport), _s in c._int8_edges.items():
        for p, dst, dport in c.model.out_edges[src]:
            if p == sport:
                t = c.model.nodes[dst].op_type
                by_type[t] = by_type.get(t, 0) + 1
    # stem pools + inception pool branches consume stored int8
    assert by_type.get("MaxPool", 0) >= 10, by_type
    # stem LRNs read int8 (fused dequant)
    assert by_type.get("LRN", 0) >= 2, by_type
    # all 9 inception joins carry int8 (4 branch inputs each)
    assert by_type.get("Concat", 0) >= 36, by_type
    ref = compile_model(m, Config())({"data": blob})
    out = c({"data": blob})
    k = next(iter(out))
    assert np.argmax(out[k]) == np.argmax(ref[k])


def test_int8_maxpool_carry_exact():
    """max commutes with the positive dequant scale: pooling stored int8
    codes then dequantizing equals pooling the dequantized values."""
    import jax.numpy as jnp

    from pyopenvino_tpu.ir.builder import GraphBuilder

    rng = np.random.default_rng(7)
    x = rng.integers(-127, 128, (1, 8, 12, 12)).astype(np.float32)
    s = 0.173
    b = GraphBuilder("pool_carry")
    p = b.parameter("x", (1, 8, 12, 12))
    pool = b.max_pool(p, kernel=(3, 3), strides=(2, 2))
    b.result(pool)
    m = b.build()
    ref = compile_model(m, Config())({"x": x * s})
    k = next(iter(ref))

    import jax

    from pyopenvino_tpu.ops import get_op
    from pyopenvino_tpu.ops.spec import TValue
    from pyopenvino_tpu.runtime.compiler import EmitCtx, infer_shapes

    node = next(n for n in m if n.op_type == "MaxPool")
    ctx = EmitCtx(m, infer_shapes(m), Config())
    tv = TValue(
        jnp.asarray(x.transpose(0, 2, 3, 1).astype(np.int8)), "CL", act_scale=s
    )
    out = get_op("MaxPool").emit(ctx, node, {0: tv})[node.out_port]
    assert out.arr.dtype == jnp.int8 and out.act_scale == s
    np.testing.assert_allclose(
        np.asarray(out.nchw(), np.float32) * s, ref[k], rtol=1e-6
    )


def test_int8_storage_mnist_golden(mnist_image):
    """MNIST golden top-3 survives the full quantized dataflow."""
    from pyopenvino_tpu.config import Backend, Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    xml, binp = model_paths("mnist")
    cal = [{"conv2d_input": mnist_image}]
    c = compile_model(
        read_ir_model(xml, binp),
        Config(backend=Backend.XLA, quant=QuantMode.INT8_FULL),
        calibration_samples=cal,
    )
    out = c({"conv2d_input": mnist_image})
    scores = next(iter(out.values())).reshape(-1)
    assert list(np.argsort(scores)[::-1][:3]) == [2, 0, 1]


# ---------------------------------------------------------------------------
# KL (entropy) calibration — passes/calibrate.py method="kl"
# ---------------------------------------------------------------------------


def test_kl_threshold_clips_outliers_keeps_bulk():
    """The entropy search must clip a heavy outlier tail (threshold far
    below absmax) yet leave an outlier-free distribution essentially
    unclipped — the property that distinguishes it from a fixed
    percentile."""
    from pyopenvino_tpu.passes.calibrate import _KL_BINS, _kl_threshold

    rng = np.random.default_rng(0)
    bulk = np.abs(rng.normal(0, 1.0, 100_000))
    tailed = np.concatenate([bulk, [40.0, 45.0, 50.0]])
    h, edges = np.histogram(tailed, bins=_KL_BINS, range=(0.0, tailed.max()))
    t = _kl_threshold(h, edges)
    assert 2.0 < t < tailed.max() / 3, t

    h2, edges2 = np.histogram(bulk, bins=_KL_BINS, range=(0.0, bulk.max()))
    t2 = _kl_threshold(h2, edges2)
    assert t2 > 0.8 * bulk.max(), t2


def test_kl_calibrated_mnist_keeps_golden_top3(mnist_image):
    """End-to-end INT8-FULL with method='kl' on real MNIST weights: the
    raw-pixel input tensor must stay at its max-abs scale (its histogram
    is legitimate signal, not outliers) and the golden top-3 holds.
    [Regression: a Q-side tail-fold bug made the scan always pick the
    minimum candidate (absmax/16 scales) and flipped the golden order.]"""
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    # representative calibration: the real digit plus shifted variants —
    # entropy calibration reads the histogram SHAPE, so feeding it mostly
    # uniform noise distorts every deep layer's distribution (round-2
    # finding: calibration must see representative data)
    cal = [{"conv2d_input": mnist_image}] + [
        {"conv2d_input": np.roll(mnist_image, shift, axis=(2, 3))}
        for shift in ((1, 0), (0, 1), (-1, -1))
    ]
    xml, binp = model_paths("mnist")
    net = compile_model(
        read_ir_model(xml, binp),
        Config(quant=QuantMode.INT8_FULL, calibration_method="kl"),
        calibration_samples=cal,
    )
    out = net({"conv2d_input": mnist_image})
    k = next(iter(out))
    assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]


def test_unknown_calibration_method_rejected():
    from pyopenvino_tpu.passes.calibrate import calibrate_activations
    from pyopenvino_tpu.ir import read_ir_model
    from tests.conftest import model_paths

    xml, binp = model_paths("mnist")
    model = read_ir_model(xml, binp)
    with pytest.raises(ValueError, match="method"):
        calibrate_activations(model, [], method="entropy2")


# ---------------------------------------------------------------------------
# Analytic bias correction (passes/bias_correct.py, Config.bias_correction)
# ---------------------------------------------------------------------------


def _skewed_conv_net():
    from pyopenvino_tpu.ir.builder import GraphBuilder

    rng = np.random.default_rng(0)
    b = GraphBuilder("bc")
    x = b.parameter("in", (1, 8, 16, 16))
    w = rng.normal(0, 0.3, (16, 8, 3, 3)).astype(np.float32)
    bias = rng.normal(0, 0.1, (1, 16, 1, 1)).astype(np.float32)
    y = b.relu(b.add(b.conv2d(x, b.const(w), pads=((1, 1), (1, 1))),
                     b.const(bias)))
    w2 = rng.normal(0, 0.3, (16, 16, 3, 3)).astype(np.float32)
    bias2 = rng.normal(0, 0.1, (1, 16, 1, 1)).astype(np.float32)
    y = b.add(b.conv2d(y, b.const(w2), pads=((1, 1), (1, 1))),
              b.const(bias2))
    b.result(y, name="out")
    return b.build(), rng


def test_bias_correction_shrinks_mean_shift():
    """On positive-mean inputs (every post-ReLU tensor), int8 weight
    rounding shifts each layer's mean output; the analytic correction
    must remove most of it (measured on this testbed: 24x) and reduce
    the overall MAE vs fp32."""
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.runtime.compiler import compile_model

    model, rng = _skewed_conv_net()
    samples = [
        {"in": np.abs(rng.normal(2, 1, (1, 8, 16, 16))).astype(np.float32)}
        for _ in range(6)
    ]
    test = np.abs(rng.normal(2, 1, (1, 8, 16, 16))).astype(np.float32)
    fp = compile_model(model)({"in": test})["out"]
    plain = compile_model(
        model, Config(quant=QuantMode.INT8_WEIGHT)
    )({"in": test})["out"]
    bc = compile_model(
        model, Config(quant=QuantMode.INT8_WEIGHT, bias_correction=True),
        calibration_samples=samples,
    )({"in": test})["out"]
    shift_plain = abs(float((plain - fp).mean()))
    shift_bc = abs(float((bc - fp).mean()))
    assert shift_bc < 0.25 * shift_plain, (shift_plain, shift_bc)
    assert np.abs(bc - fp).mean() < np.abs(plain - fp).mean()


def test_bias_correction_requires_samples():
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.runtime.compiler import compile_model

    model, _ = _skewed_conv_net()
    with pytest.raises(ValueError, match="calibration_samples"):
        compile_model(
            model, Config(quant=QuantMode.INT8_WEIGHT, bias_correction=True)
        )


def test_bias_correction_keeps_mnist_golden(mnist_image):
    from pyopenvino_tpu.config import Config, QuantMode
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.compiler import compile_model
    from tests.conftest import model_paths

    xml, binp = model_paths("mnist")
    net = compile_model(
        read_ir_model(xml, binp),
        Config(quant=QuantMode.INT8_WEIGHT, bias_correction=True),
        calibration_samples=[{"conv2d_input": mnist_image}],
    )
    out = net({"conv2d_input": mnist_image})
    k = next(iter(out))
    assert list(np.argsort(out[k][0])[::-1][:3]) == [2, 0, 1]


@pytest.mark.parametrize("name", ["vit-tiny", "moe-mlp"])
def test_int8_dataflow_covers_batched_matmul(name):
    """>2-D MatMuls (ViT token projections at rank 3, MoE expert stacks)
    ride the same INT8-FULL inter-layer dataflow as the CNNs: int8-stored
    edges must feed rank-3 MatMul inputs (ops/matmul.py any-rank int8 MXU
    path), and top-1 must survive."""
    xml, binp = model_paths(name)
    m = read_ir_model(xml, binp)
    pnode = next(n for n in m.nodes.values() if n.op_type == "Parameter")
    in_name, shape = pnode.name, pnode.outputs[0].shape
    blob = np.random.default_rng(0).uniform(0, 255, shape).astype(np.float32)
    c = compile_model(
        m, Config(quant=QuantMode.INT8_FULL),
        calibration_samples=[{in_name: blob}],
    )
    rank3 = sum(
        1
        for (src, sport), _s in c._int8_edges.items()
        for p, dst, dport in c.model.out_edges[src]
        if p == sport and c.model.nodes[dst].op_type == "MatMul"
        and len(c.model.nodes[dst].inputs[0].shape) == 3
    )
    assert rank3 >= 4, rank3
    ref = compile_model(m, Config())({in_name: blob})
    out = c({in_name: blob})
    k = next(iter(out))
    assert np.argmax(out[k]) == np.argmax(ref[k])
    assert np.abs(out[k] - ref[k]).max() < 0.05


def test_quant_min_elems_excludes_small_weights():
    """Config.quant_min_elems: first/last-layer exclusion — weights under
    the element threshold stay float (passes/quantize.py)."""
    from pyopenvino_tpu.passes.quantize import quantize_weights

    xml, binp = model_paths("mnist")
    m = read_ir_model(xml, binp)
    all_q = quantize_weights(m)
    some_q = quantize_weights(m, 4096)
    assert set(some_q) < set(all_q)  # strictly fewer, none new
    sizes = {nid: m.nodes[nid].const.size for nid in all_q}
    for nid in all_q:
        assert (nid in some_q) == (sizes[nid] >= 4096), sizes[nid]
