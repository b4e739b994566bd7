"""Property-based differential fuzzing: random small graphs built with
ir/builder.py must agree between the numpy interpreter and the compiled
XLA path.

This extends the reference's two testing ideas (SURVEY.md §4 — per-layer
expected_result comparison + pickled single-op fixtures) to a generator:
instead of four fixed model topologies, every seed produces a fresh DAG of
conv / pool / elementwise / matmul nodes with randomized shapes, paddings,
strides and broadcast patterns, and the whole inventory of shape-inference,
padding parity and layout handling is cross-checked end to end.  Failures
reproduce from the seed alone.
"""

import numpy as np
import pytest

from pyopenvino_tpu.config import Backend, Config
from pyopenvino_tpu.ir.builder import GraphBuilder
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter


def _random_graph(seed):
    """Build a random conv-net DAG; returns (model, input_name, in_shape)."""
    rng = np.random.default_rng(seed)
    b = GraphBuilder(f"fuzz_{seed}")
    c0 = int(rng.choice([3, 4, 8]))
    hw = int(rng.choice([12, 14, 16]))
    x = b.parameter("in", (1, c0, hw, hw))
    live = [x]

    def w_const(co, ci, k):
        w = rng.normal(0, 0.4, (co, ci, k, k)).astype(np.float32)
        return b.const(w)

    n_ops = int(rng.integers(5, 12))
    for _ in range(n_ops):
        src = live[int(rng.integers(len(live)))]
        _, c, h, w = src.shape
        kind = rng.choice(
            ["conv", "pool", "relu", "clamp", "sigmoid", "biasadd", "scale",
             "residual", "dwconv", "lrn", "concat", "transpose2",
             "meansub", "stddiv", "minmax", "pad", "chansplit", "resize",
             "act2", "mvn", "deconv", "fq", "nl2", "blockspatial",
             "unary3", "moe", "maskselect", "topkgate", "ti", "ifcond",
             "loopcnt"]
        )
        if kind == "conv":
            k = int(rng.choice([1, 3]))
            s = int(rng.choice([1, 2])) if h >= 6 else 1
            co = int(rng.choice([4, 8, 16]))
            pad = k // 2 if rng.random() < 0.7 else 0
            if h + 2 * pad < k:
                continue
            out = b.conv2d(
                src, w_const(co, c, k), strides=(s, s),
                pads=((pad, pad), (pad, pad)),
            )
        elif kind == "pool" and h >= 4:
            k = int(rng.choice([2, 3]))
            s = int(rng.choice([1, 2]))
            pad = 1 if (k == 3 and rng.random() < 0.5) else 0
            mk = b.max_pool if rng.random() < 0.5 else b.avg_pool
            out = mk(src, kernel=(k, k), strides=(s, s),
                     pads=((pad, pad), (pad, pad)))
        elif kind == "relu":
            out = b.relu(src)
        elif kind == "clamp":
            out = b.clamp(src, 0.0, 6.0)
        elif kind == "sigmoid":
            out = b.sigmoid(src)
        elif kind == "biasadd":
            bias = rng.normal(0, 0.2, (1, c, 1, 1)).astype(np.float32)
            out = b.add(src, b.const(bias))
        elif kind == "scale":
            sc = rng.uniform(0.5, 1.5, (1, c, 1, 1)).astype(np.float32)
            out = b.multiply(src, b.const(sc))
        elif kind == "residual":
            # same-shape partner if one exists, else skip
            partners = [p for p in live if p.shape == src.shape and p is not src]
            if not partners:
                continue
            out = b.add(src, partners[int(rng.integers(len(partners)))])
        elif kind == "dwconv":
            k = 3
            s = int(rng.choice([1, 2])) if h >= 6 else 1
            wd = rng.normal(0, 0.4, (c, 1, 1, k, k)).astype(np.float32)
            out = b.group_conv2d(src, b.const(wd), strides=(s, s),
                                 pads=((1, 1), (1, 1)))
        elif kind == "lrn":
            out = b.lrn(src, size=min(5, c) | 1)
        elif kind == "concat":
            partners = [
                p for p in live
                if p.shape[0] == src.shape[0] and p.shape[2:] == src.shape[2:]
            ]
            if len(partners) < 2:
                continue
            picks = [partners[int(rng.integers(len(partners)))]
                     for _ in range(2)]
            out = b.concat([src] + picks, axis=1)
        elif kind == "transpose2":
            # NCHW→NHWC→NCHW round trip: exercises Transpose emit + the
            # layout machinery without changing the logical shape
            t = b.transpose(src, (0, 2, 3, 1))
            out = b.transpose(t, (0, 3, 1, 2))
        elif kind == "meansub":
            # unfolded preprocessing: per-channel mean subtraction
            mean = rng.normal(0, 0.3, (1, c, 1, 1)).astype(np.float32)
            out = b.subtract(src, b.const(mean))
        elif kind == "stddiv":
            std = rng.uniform(0.7, 1.4, (1, c, 1, 1)).astype(np.float32)
            out = b.divide(src, b.const(std))
        elif kind == "minmax":
            lo = rng.normal(-0.5, 0.1, (1, c, 1, 1)).astype(np.float32)
            out = b.maximum(b.minimum(src, b.const(
                np.full((1, c, 1, 1), 4.0, np.float32))), b.const(lo))
        elif kind == "pad":
            pb = [0, 0, int(rng.integers(0, 2)), int(rng.integers(0, 2))]
            pe = [0, 0, int(rng.integers(0, 2)), int(rng.integers(0, 2))]
            mode = str(rng.choice(["constant", "edge"]))
            out = b.pad(src, pb, pe, mode=mode,
                        value=0.0 if mode == "constant" else None)
        elif kind == "chansplit" and c % 2 == 0 and c >= 4:
            # split → touch one half → concat back (multi-output op path)
            lo_, hi_ = b.split(src, axis=1, num_splits=2)
            out = b.concat([lo_, b.relu(hi_)], axis=1)
        elif kind == "resize" and h >= 3:
            mode = str(rng.choice(["nearest", "linear"]))
            t = int(rng.choice([h // 2, h * 2])) or 1
            out = b.interpolate(src, (t, t), mode=mode,
                                align_corners=bool(rng.random() < 0.5))
        elif kind == "act2":
            which = str(rng.choice(["swish", "hswish", "mish", "elu",
                                    "gelu", "prelu"]))
            if which == "prelu":
                slope = rng.uniform(0, 0.5, (1, c, 1, 1)).astype(np.float32)
                out = b.prelu(src, slope)
            else:
                out = getattr(b, which)(src)
        elif kind == "mvn":
            out = b.mvn(src, across_channels=bool(rng.random() < 0.5))
        elif kind == "fq":
            # POT-style per-channel fake-quantize; wide ranges keep the
            # grid coarse enough that interpreter/XLA f32 noise cannot
            # straddle a rounding boundary
            hi = rng.uniform(2.0, 6.0, (1, c, 1, 1)).astype(np.float32)
            out = b.fake_quantize(src, -hi, hi, -hi, hi, levels=256)
        elif kind == "nl2":
            out = b.normalize_l2(src, axes=(1,), eps=1e-8,
                                 eps_mode=str(rng.choice(["add", "max"])))
        elif kind == "blockspatial":
            mode = str(rng.choice(["blocks_first", "depth_first"]))
            if c % 4 == 0:
                out = b.depth_to_space(src, 2, mode=mode)
            elif h % 2 == 0 and w % 2 == 0:
                out = b.space_to_depth(src, 2, mode=mode)
            else:
                continue
        elif kind == "unary3":
            out = b.unary(str(rng.choice(["Abs", "Erf", "Negative"])), src)
        elif kind == "ti":
            # TensorIterator over the H axis: a leaky recurrent row
            # accumulator s' = tanh(x_t + decay·s) run as one lax.scan
            # (ops/subgraph.py) — the fuzz twin of the ocr-ti family
            feat = c * w
            seq = b.reshape(src, (1, h, feat))
            decay = np.float32(rng.uniform(0.3, 0.9))
            bb = GraphBuilder(f"ti_body_{len(live)}")
            xt = bb.parameter("x_t", (1, 1, feat))
            s = bb.parameter("s_in", (1, feat))
            s2 = bb.unary("Tanh", bb.add(
                bb.reshape(xt, (1, feat)),
                bb.multiply(s, bb.const(decay.reshape(())))))
            bb.result(s2, "s_out")
            bb.result(bb.reshape(s2, (1, 1, feat)), "y_out")
            reverse = bool(rng.random() < 0.5)
            sl = ({"axis": 1, "start": -1, "end": 0, "stride": -1}
                  if reverse else {"axis": 1})
            init = b.const(np.zeros((1, feat), np.float32))
            y = b.tensor_iterator(
                [seq, init], bb.build(),
                input_map=[("x_t", sl), "s_in"],
                output_map=[("y_out", sl)],
                back_edges=[("s_out", "s_in")])
            out = b.reshape(y, (1, c, h, w))
        elif kind == "ifcond":
            # data-dependent If: branch on the feature-map mean sign —
            # lax.cond through both executors (ops/subgraph.py)
            tb = GraphBuilder(f"then_{len(live)}")
            xa = tb.parameter("xa", (1, c, h, w))
            tb.result(tb.relu(xa), "r")
            eb = GraphBuilder(f"else_{len(live)}")
            xb_ = eb.parameter("xb", (1, c, h, w))
            eb.result(eb.multiply(
                xb_, eb.const(np.float32(rng.uniform(0.5, 1.5)).reshape(
                    ()))), "r")
            gm = b.reduce("Mean", src, axes=(0, 1, 2, 3), keep_dims=False)
            cond = b.compare("Greater", gm,
                             b.const(np.float32(0).reshape(())))
            out = b.if_op(cond, [src], tb.build(), eb.build(),
                          ["xa"], ["xb"], ["r"], ["r"])
        elif kind == "loopcnt":
            # static-trip-count Loop: k damped accumulations of the map
            # onto itself — lax.while_loop with carried state
            # (ops/subgraph.py Loop)
            bb = GraphBuilder(f"loop_body_{len(live)}")
            st = bb.parameter("s_in", (1, c, h, w))
            inc = bb.parameter("inc", (1, c, h, w))
            bb.result(bb.add(bb.multiply(
                st, bb.const(np.float32(0.8).reshape(()))), inc), "s_out")
            bb.result(bb.const(np.asarray(True).reshape(())), "cond")
            trips = int(rng.integers(2, 5))
            tc = b.const(np.asarray(trips, np.int64).reshape(()))
            ec = b.const(np.asarray(True).reshape(()))
            out = b.loop(tc, ec, [src, src], bb.build(),
                         input_map=["s_in", "inc"], output_map=["s_out"],
                         back_edges=[("s_out", "s_in")],
                         condition_result="cond")
        elif kind == "moe":
            # dense-gated expert mixture on the GAP vector, re-applied to
            # the feature map as an SE-style gate — exercises Tile,
            # stacked rank-3 Const MatMul (the EP weight shape,
            # tools/gen_moe.py), rank-2 softmax and ReduceSum over the
            # expert axis
            E = int(rng.choice([2, 4]))
            ch = int(rng.choice([4, 8]))
            gapv = b.reduce("Mean", src, axes=(2, 3), keep_dims=False)
            wr = rng.normal(0, 0.4, (c, E)).astype(np.float32)
            gate = b.softmax(b.matmul(gapv, b.const(wr)), axis=1)
            xt = b.tile(b.reshape(gapv, (1, 1, c)), (E, 1, 1))
            w_in = rng.normal(0, 0.4, (E, c, ch)).astype(np.float32)
            w_out = rng.normal(0, 0.4, (E, ch, c)).astype(np.float32)
            y = b.matmul(b.gelu(b.matmul(xt, b.const(w_in))),
                         b.const(w_out))
            gt = b.reshape(b.transpose(gate, (1, 0)), (E, 1, 1))
            mix = b.reduce("Sum", b.multiply(y, gt), axes=(0,),
                           keep_dims=False)
            out = b.multiply(src, b.reshape(b.sigmoid(mix), (1, c, 1, 1)))
        elif kind == "maskselect":
            # comparison → logical → Select mask idiom (ops/extended.py):
            # keep activations above a random threshold, damp the rest
            thr = b.const(
                np.float32(rng.uniform(-0.2, 0.2)))
            cond = b.compare("Greater", src, thr)
            if rng.random() < 0.5:
                cond = b.logical_not(cond)
            damp = b.multiply(src, b.const(np.float32(0.5)))
            out = b.select(cond, src, damp)
        elif kind == "topkgate":
            # TopK over channels on the GAP vector → per-channel binary
            # gate (values path keeps the k strongest channels) —
            # exercises TopK's dual outputs through scatter-free masking
            if c < 3:
                continue
            k = int(rng.integers(1, c))
            gapv = b.reduce("Mean", src, axes=(2, 3), keep_dims=False)
            vals, _idx = b.top_k(gapv, k, axis=1, mode="max", sort="value")
            kth = b.gather(b.reshape(vals, (k,)), [k - 1], axis=0)
            # compare against kth MINUS a fat margin: under sharded
            # execution GSPMD may materialize gapv twice with different
            # reduction orders, and an exact-tie `gapv >= kth` (the kth
            # element compares against ITSELF) flips on that sub-ULP
            # noise — found by the round-5 200-seed sweep (seed 75,
            # dp2_sp2: one flipped channel → 72% of outputs wrong).
            # The margin keeps the gate's semantics (k strongest pass)
            # while making the discontinuity noise-proof.
            kth = b.subtract(kth, b.const(np.float32(1e-3).reshape(())))
            gate = b.compare("GreaterEqual", gapv,
                             b.reshape(kth, (1, 1)))
            gatef = b.convert(gate, "f32")
            out = b.multiply(src, b.reshape(gatef, (1, c, 1, 1)))
        elif kind == "deconv" and h <= 16:
            k = int(rng.choice([2, 3]))
            s = int(rng.choice([1, 2]))
            # pad ≤ (k-1)//2 keeps out = (h-1)s + k - 2·pad + opad positive
            # for every surviving h (pools can shrink h to 1)
            pad = int(rng.integers(0, (k + 1) // 2))
            opad = int(rng.integers(0, s))
            co = int(rng.choice([4, 8]))
            wd = rng.normal(0, 0.4, (c, co, k, k)).astype(np.float32)
            out = b.conv_transpose2d(src, b.const(wd), strides=(s, s),
                                     pads=((pad, pad), (pad, pad)),
                                     output_padding=(opad, opad))
        else:
            continue
        live.append(out)

    # classification-style head exercises reshape + matmul + softmax
    tail = live[-1]
    _, c, h, w = tail.shape
    flat = b.reshape(tail, (1, c * h * w))
    wm = rng.normal(0, 0.3, (c * h * w, 10)).astype(np.float32)
    logits = b.matmul(flat, b.const(wm))
    b.result(b.softmax(logits, axis=1), name="prob")
    return b.build(), "in", (1, c0, hw, hw)


@pytest.mark.parametrize("seed", range(10))
def test_random_graph_interpreter_vs_xla(seed):
    model, in_name, in_shape = _random_graph(seed)
    rng = np.random.default_rng(seed + 1000)
    blob = rng.normal(0, 1, in_shape).astype(np.float32)

    ref = Interpreter(model).run({in_name: blob})
    net = compile_model(model, Config(backend=Backend.XLA))
    got = net.infer({in_name: blob})

    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=1e-4, atol=1e-5,
            err_msg=f"seed={seed} output {k!r}",
        )


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_random_graph_int8_weight_parity(seed):
    """INT8 weight-only on a random graph stays within a small band of the
    fp32 interpreter: per-output-channel weight quantization on these tiny
    nets introduces bounded error, and the compile pipeline (quantize pass
    + fused dequant) must not amplify it.  Bit-level backend parity is
    covered by the fp32 test above."""
    from pyopenvino_tpu.config import QuantMode

    model, in_name, in_shape = _random_graph(seed)
    rng = np.random.default_rng(seed + 2000)
    blob = rng.normal(0, 1, in_shape).astype(np.float32)

    net = compile_model(model, Config(backend=Backend.XLA,
                                      quant=QuantMode.INT8_WEIGHT))
    got = net.infer({in_name: blob})
    ref = Interpreter(model).run({in_name: blob})
    for k in ref:
        # weight-only int8 error on these tiny nets stays small; this is a
        # sanity band, not bit parity (the fp32 test above covers that)
        np.testing.assert_allclose(
            got[k], ref[k], rtol=0.2, atol=0.05,
            err_msg=f"seed={seed} output {k!r}",
        )


@pytest.mark.parametrize("seed", [0, 4])
def test_random_graph_int8_dataflow_on_off(seed):
    """Isolate the INT8-FULL inter-layer dataflow (carries/accepters +
    central dequant guard): with identical calibrated scales, dataflow
    on vs off may differ ONLY by the int8 storage rounding of stored
    edges — a gross-bug detector for double dequantization or wrong
    carried scales.  (Offline sweeps: 30 seeds clean; plus 400 fp32 and
    40 pallas-backend seeds — docs/MEASUREMENTS.md.)"""
    from pyopenvino_tpu.config import QuantMode

    model, in_name, in_shape = _random_graph(seed)
    rng = np.random.default_rng(seed + 1000)
    blob = rng.normal(0, 1, in_shape).astype(np.float32)
    cal = [{in_name: blob},
           {in_name: rng.normal(0, 1, in_shape).astype(np.float32)}]
    on = compile_model(model, Config(quant=QuantMode.INT8_FULL),
                       calibration_samples=cal).infer({in_name: blob})
    off = compile_model(
        model, Config(quant=QuantMode.INT8_FULL, int8_dataflow=False),
        calibration_samples=cal).infer({in_name: blob})
    for k in on:
        np.testing.assert_allclose(on[k], off[k], rtol=0.3, atol=0.05,
                                   err_msg=f"seed={seed} output {k!r}")
