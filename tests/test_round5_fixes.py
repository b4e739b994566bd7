"""Round-5 advisor-finding fixes.

Four low-severity findings from ADVICE.md (round 4): TopK integer-mode
negation wrap, PriorBox silently ignoring fixed_size/fixed_ratio/density,
Einsum shape inference accepting size-1 'broadcast' of a repeated label
that the executors reject, and torch BatchNorm2d(affine=False) crashing
the converter.
"""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


# -- TopK on integer dtypes ---------------------------------------------------

def _topk_model(shape, k, dtype, **kw):
    b = GraphBuilder("tk")
    x = b.parameter("x", shape, dtype=dtype)
    vals, idx = b.top_k(x, k, **kw)
    b.result(vals, "vals")
    b.result(idx, "idx")
    return b.build()


@pytest.mark.parametrize("mode", ["max", "min"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int32])
def test_topk_integer_with_zeros(mode, dtype):
    """min-TopK on unsigned input containing 0 must rank 0 FIRST (negation
    wraps 0 to 0 but 1 to 255, which used to rank zeros last); max-TopK on
    unsigned had the mirror bug in the numpy executor."""
    m = _topk_model((1, 6), 3, dtype, axis=1, mode=mode)
    x = np.asarray([[5, 0, 200, 17, 0, 3]], dtype=dtype)
    ref = Interpreter(m).run({"x": x})
    got = compile_model(m, Config(backend=Backend.XLA))({"x": x})
    np.testing.assert_array_equal(got["vals"], ref["vals"])
    np.testing.assert_array_equal(got["idx"], ref["idx"])
    if mode == "min":
        np.testing.assert_array_equal(ref["vals"], [[0, 0, 3]])
        np.testing.assert_array_equal(ref["idx"], [[1, 4, 5]])
    else:
        np.testing.assert_array_equal(ref["vals"], [[200, 17, 5]])
        np.testing.assert_array_equal(ref["idx"], [[2, 3, 0]])


def test_topk_int_min_boundary():
    """INT_MIN negates to itself; the bit-flip key must still rank it."""
    m = _topk_model((1, 4), 2, np.int32, axis=1, mode="min")
    lo = np.iinfo(np.int32).min
    x = np.asarray([[7, lo, -1, lo + 1]], np.int32)
    ref = Interpreter(m).run({"x": x})
    got = compile_model(m, Config(backend=Backend.XLA))({"x": x})
    np.testing.assert_array_equal(ref["vals"], [[lo, lo + 1]])
    np.testing.assert_array_equal(got["vals"], ref["vals"])
    np.testing.assert_array_equal(got["idx"], ref["idx"])


# -- PriorBox fixed_size refusal ---------------------------------------------

def test_prior_box_fixed_size_fails_fast():
    b = GraphBuilder("pb")
    g = b.const(np.asarray([4, 4], np.int64), "grid")
    im = b.const(np.asarray([64, 64], np.int64), "img")
    with pytest.raises(NotImplementedError, match="fixed_size"):
        b._add_node("PriorBox", [g, im], {
            "min_size": "16.0", "offset": "0.5",
            "fixed_size": "32.0", "density": "2.0",
        }, out_dtype=np.float32)


# -- Einsum repeated-label extent mismatch ------------------------------------

def test_einsum_size1_label_mismatch_fails_fast():
    """jnp.einsum rejects (1 vs d) extents for the same label, so shape
    inference must reject them too instead of deferring the failure."""
    b = GraphBuilder("es")
    x = b.parameter("x", (1, 3))
    y = b.parameter("y", (4, 3))
    with pytest.raises(ValueError, match="bound to both"):
        b._add_node("Einsum", [x, y], {"equation": "ij,ij->j"})


# -- torch BatchNorm2d(affine=False) ------------------------------------------

def test_torch_bn_affine_false():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from tools.torch_convert import convert_torch_module

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn = nn.BatchNorm2d(3, affine=False)

        def forward(self, x):
            return self.bn(x)

    mod = M().eval()
    # give running stats non-trivial values
    with torch.no_grad():
        mod.bn.running_mean.copy_(torch.tensor([0.5, -1.0, 2.0]))
        mod.bn.running_var.copy_(torch.tensor([1.5, 0.25, 4.0]))
    model = convert_torch_module(mod, (1, 3, 4, 4))
    x = np.random.default_rng(0).standard_normal((1, 3, 4, 4)).astype(
        np.float32)
    want = mod(torch.from_numpy(x)).detach().numpy()
    got = next(iter(Interpreter(model).run({"data": x}).values()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
