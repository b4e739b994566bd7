"""Offline POT-style quantizer (tools/pot_quantize.py): any IR →
quantized IR with FakeQuantize nodes, round-tripping through the writer
and re-entering the engine where weight-FQ folds into the native INT8
path (passes/fold_fq.py).  The reference has no quantization tooling
(SURVEY.md §2)."""

import numpy as np
import pytest

from pyopenvino_tpu.config import Config, QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.ir.writer import write_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter
from tools.pot_quantize import gen_samples, quantize_ir


@pytest.fixture(scope="module")
def mnist():
    from __graft_entry__ import _model_paths

    xml, binp = _model_paths("mnist")
    return read_ir_model(xml, binp)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (1, 1, 28, 28)).astype(np.float32)


def _top3(out):
    return np.argsort(next(iter(out.values())).reshape(-1))[::-1][:3]


def test_quantize_ir_structure(mnist):
    q = quantize_ir(mnist, samples=gen_samples(mnist, 2))
    fqs = q.find_by_type("FakeQuantize")
    # mnist: 3 convs + 2 matmuls → 5 weight FQs + 5 activation FQs
    assert len(fqs) == 10
    assert all(int(f.attrs["levels"]) == 256 for f in fqs)
    # conv weight FQ ranges are per-output-channel (rank-4 keepdims)
    const_ids = {n.id for n in q.find_by_type("Const")}
    per_channel = 0
    for f in fqs:
        lo_src, _ = q.in_edges[f.id][1]
        if lo_src in const_ids:
            rng_shape = q.nodes[lo_src].const.shape
            if len(rng_shape) == 4 and max(rng_shape) > 1:
                per_channel += 1
    assert per_channel == 3  # one per conv


def test_pot_ir_round_trip_and_accuracy(mnist, blob, tmp_path):
    q = quantize_ir(mnist, samples=gen_samples(mnist, 4))
    path = str(tmp_path / "mnist_q.xml")
    write_ir_model(q, path)
    q2 = read_ir_model(path, path[:-4] + ".bin")
    pname = mnist.parameters[0].name

    ref = Interpreter(mnist).run({pname: blob})
    got = Interpreter(q2).run({pname: blob})
    assert list(_top3(got)) == list(_top3(ref))
    k = next(iter(ref))
    # quantization error is bounded by the grid, not unbounded drift
    assert float(np.abs(got[k] - ref[k]).max()) < 0.1


def test_pot_ir_engages_native_int8(mnist, blob, tmp_path):
    q = quantize_ir(mnist, samples=gen_samples(mnist, 4))
    path = str(tmp_path / "mnist_q.xml")
    write_ir_model(q, path)
    q2 = read_ir_model(path, path[:-4] + ".bin")
    pname = mnist.parameters[0].name

    net = compile_model(q2, Config(quant=QuantMode.INT8_WEIGHT))
    # every weight FQ folded into its Const → int8w quantized all 5
    assert len(net._quantized or {}) == 5
    ref = compile_model(mnist, Config()).infer({pname: blob})
    out = net.infer({pname: blob})
    assert list(_top3(out)) == list(_top3(ref))


def test_weight_only_mode(mnist):
    q = quantize_ir(mnist, activations=False)
    fqs = q.find_by_type("FakeQuantize")
    assert len(fqs) == 5  # weights only, no calibration needed


def test_requantizing_a_pot_ir_is_stable(mnist):
    """Quantizing an already-quantized IR must not stack activation FQs
    on top of existing ones."""
    q1 = quantize_ir(mnist, samples=gen_samples(mnist, 2))
    q2 = quantize_ir(q1, samples=gen_samples(q1, 2))
    # weight consts now feed FQ nodes (not weight ports), and activation
    # inputs already come from FQ nodes → no doubling
    n1 = len(q1.find_by_type("FakeQuantize"))
    n2 = len(q2.find_by_type("FakeQuantize"))
    assert n2 == n1


def test_zero_sits_exactly_on_the_grid(mnist, blob):
    """The symmetric grid convention (il = -128/127*hi) keeps exact
    zeros — everything post-ReLU — untouched by activation FQ."""
    from pyopenvino_tpu.ir.builder import GraphBuilder

    b = GraphBuilder("z")
    x = b.parameter("in", (1, 1, 2, 2))
    from tools.pot_quantize import _sym_ranges

    lo, hi = _sym_ranges(np.array([2.0], np.float32), 256)
    b.result(b.fake_quantize(x, lo, hi, lo, hi, levels=256), name="out")
    m = b.build()
    data = np.array([0.0, 2.0, -2.0, 1.0], np.float32).reshape(1, 1, 2, 2)
    out = next(iter(Interpreter(m).run({"in": data}).values()))
    assert out.reshape(-1)[0] == 0.0          # zero exact
    np.testing.assert_allclose(out.reshape(-1)[1], 2.0)  # hi exact


def test_int8_full_without_calibration(mnist, blob, tmp_path):
    """A POT IR carries its own activation scales: INT8_FULL compiles
    with NO calibration samples, extracting scales from the symmetric
    activation FQs (passes/fold_fq.extract_act_scales)."""
    q = quantize_ir(mnist, samples=gen_samples(mnist, 4))
    path = str(tmp_path / "mnist_q.xml")
    write_ir_model(q, path)
    q2 = read_ir_model(path, path[:-4] + ".bin")
    pname = mnist.parameters[0].name

    net = compile_model(q2, Config(quant=QuantMode.INT8_FULL))
    assert len(net.act_scales or {}) == 5     # all from the IR
    ref = compile_model(mnist, Config()).infer({pname: blob})
    out = net.infer({pname: blob})
    assert list(_top3(out)) == list(_top3(ref))
    # the plain model still demands samples
    with pytest.raises(ValueError, match="calibration_samples"):
        compile_model(mnist, Config(quant=QuantMode.INT8_FULL))


def test_weight_only_pot_ir_still_needs_samples(mnist, tmp_path):
    """--no-activations IRs carry weight FQs only: INT8_FULL must
    still ask for calibration rather than silently running unscaled."""
    q = quantize_ir(mnist, activations=False)
    path = str(tmp_path / "mnist_w.xml")
    write_ir_model(q, path)
    q2 = read_ir_model(path, path[:-4] + ".bin")
    with pytest.raises(ValueError, match="calibration_samples"):
        compile_model(q2, Config(quant=QuantMode.INT8_FULL))
