"""Keras → IR converter (tools/tf_convert.py).

The reference trains in TF/Keras and depends on an external Model
Optimizer it cannot run (reference: mnist-tf-training.py,
convert-model.sh); these tests close that loop natively — including the
flagship receipt: the reference's EXACT training topology converts into
a 33-node IR, the same node count Model Optimizer produced for the
shipped models/mnist.xml, with predict-parity at 1e-7.
"""

import numpy as np
import pytest

keras = pytest.importorskip("keras")

from pyopenvino_tpu.config import Config, QuantMode  # noqa: E402
from pyopenvino_tpu.runtime.compiler import compile_model  # noqa: E402
from pyopenvino_tpu.runtime.interpreter import Interpreter  # noqa: E402
from tools.tf_convert import convert_keras_model  # noqa: E402


def _parity(km, shape_nchw, scale=None, atol=1e-5, seed=0):
    m = convert_keras_model(km, scale=scale)
    rng = np.random.default_rng(seed)
    hi = scale if scale is not None else 1.0
    blob = rng.uniform(0, hi, shape_nchw).astype(np.float32)
    k_in = blob / (scale or 1.0)
    if len(shape_nchw) == 4:
        k_in = k_in.transpose(0, 2, 3, 1)
    want = km.predict(k_in, verbose=0)
    if want.ndim == 4:  # feature-map output: Keras NHWC → the IR's NCHW
        want = want.transpose(0, 3, 1, 2)
    ref = Interpreter(m).run({"data": blob})["output"]
    got = compile_model(m, Config())({"data": blob})["output"]
    np.testing.assert_allclose(ref, want, rtol=1e-4, atol=atol)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)
    return m, blob, want


def _reference_mnist_topology():
    """reference: mnist-tf-training.py:25-34, verbatim layer stack."""
    return keras.Sequential([
        keras.layers.Input((28, 28, 1)),
        keras.layers.Conv2D(32, (3, 3), activation="relu"),
        keras.layers.MaxPooling2D((2, 2)),
        keras.layers.Conv2D(64, (3, 3), activation="relu"),
        keras.layers.MaxPooling2D((2, 2)),
        keras.layers.Conv2D(64, (3, 3), activation="relu"),
        keras.layers.Flatten(),
        keras.layers.Dense(64, activation="relu"),
        keras.layers.Dense(10, activation="softmax"),
    ])


def test_reference_mnist_topology_converts_to_mo_shape():
    """The reference's own training topology with MO --scale 255 folding:
    predict-parity AND the converted IR has 33 nodes — the node count of
    the Model-Optimizer-produced models/mnist.xml (SURVEY.md §2.3)."""
    km = _reference_mnist_topology()
    m, _, _ = _parity(km, (1, 1, 28, 28), scale=255.0, atol=1e-6)
    assert len(m.nodes) == 33


def test_batchnorm_folds_from_nontrivial_stats():
    km = keras.Sequential([
        keras.layers.Input((16, 16, 3)),
        keras.layers.Conv2D(8, 3, padding="same", use_bias=False),
        keras.layers.BatchNormalization(),
        keras.layers.ReLU(),
        keras.layers.GlobalAveragePooling2D(),
        keras.layers.Dense(4, activation="softmax"),
    ])
    # non-trivial BN statistics (training-mode batches update the EMA)
    km(np.random.default_rng(1).standard_normal(
        (8, 16, 16, 3)).astype(np.float32), training=True)
    m, _, _ = _parity(km, (1, 3, 16, 16))
    assert not any("BatchNorm" in n.op_type for n in m.nodes.values())


def test_mobile_block_depthwise_same_relu6():
    km = keras.Sequential([
        keras.layers.Input((16, 16, 3)),
        keras.layers.Conv2D(8, 3, strides=2, padding="same"),
        keras.layers.ReLU(max_value=6.0),
        keras.layers.DepthwiseConv2D(3, padding="same"),
        keras.layers.ReLU(max_value=6.0),
        keras.layers.Conv2D(16, 1),
        keras.layers.GlobalAveragePooling2D(),
        keras.layers.Dense(5),
        keras.layers.Softmax(),
    ])
    m, _, _ = _parity(km, (1, 3, 16, 16))
    assert any(n.op_type == "GroupConvolution" for n in m.nodes.values())


def test_padding_upsampling_rescaling():
    km = keras.Sequential([
        keras.layers.Input((8, 8, 3)),
        keras.layers.Rescaling(1.0 / 255, offset=-0.5),
        keras.layers.ZeroPadding2D(((1, 0), (0, 2))),
        keras.layers.Conv2D(4, 3, activation="tanh"),
        keras.layers.UpSampling2D(2),
        keras.layers.Conv2D(2, 1, activation="sigmoid"),
    ])
    _parity(km, (1, 3, 8, 8))


def test_converted_keras_quantizes_and_roundtrips(tmp_path):
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model

    km = _reference_mnist_topology()
    m, blob, want = _parity(km, (1, 1, 28, 28), scale=255.0, atol=1e-6)
    q = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
    out = q({"data": blob})["output"]
    assert np.argmax(out) == np.argmax(want)

    p = str(tmp_path / "keras.xml")
    write_ir_model(m, p)
    ref2 = Interpreter(read_ir_model(p)).run({"data": blob})["output"]
    np.testing.assert_allclose(ref2, want, rtol=1e-4, atol=1e-6)


def test_functional_residual_concat():
    """Functional keras.Model graphs: residual Add, skip Concatenate
    (NHWC axis -1 → NCHW axis 1), multi-branch node walk."""
    inp = keras.Input((16, 16, 3))
    a = keras.layers.Conv2D(8, 3, padding="same", activation="relu")(inp)
    b = keras.layers.Conv2D(8, 3, padding="same")(a)
    r = keras.layers.Add()([a, b])
    r = keras.layers.ReLU()(r)
    d = keras.layers.MaxPooling2D(2)(r)
    d2 = keras.layers.Conv2D(8, 3, padding="same", activation="relu")(d)
    u = keras.layers.UpSampling2D(2)(d2)
    y = keras.layers.Concatenate()([u, r])
    y = keras.layers.Conv2D(4, 1)(y)
    out = keras.layers.GlobalAveragePooling2D()(y)
    km = keras.Model(inp, out)
    _parity(km, (1, 3, 16, 16))


def test_channel_softmax_axis_translation():
    """Softmax over NHWC channels (axis -1) lands on the IR's channel
    axis 1 — the segmentation-head case."""
    km = keras.Sequential([
        keras.layers.Input((8, 8, 3)),
        keras.layers.Conv2D(5, 1),
        keras.layers.Softmax(),
    ])
    _parity(km, (1, 3, 8, 8))


def test_subclassed_model_refused():
    class Net(keras.Model):
        def call(self, x):
            return x

    with pytest.raises(Exception):
        convert_keras_model(Net())


def test_conv2d_transpose_decoder():
    km = keras.Sequential([
        keras.layers.Input((8, 8, 3)),
        keras.layers.Conv2D(8, 3, strides=2, padding="same",
                            activation="relu"),
        keras.layers.Conv2DTranspose(4, 2, strides=2, padding="same"),
        keras.layers.Conv2DTranspose(2, 3, strides=1, padding="valid",
                                     activation="sigmoid"),
    ])
    _parity(km, (1, 3, 8, 8))


def test_conv2d_transpose_output_padding_and_dilation_guard():
    km = keras.Sequential([
        keras.layers.Input((5, 5, 3)),
        keras.layers.Conv2DTranspose(4, 3, strides=2, padding="valid",
                                     output_padding=1),
    ])
    _parity(km, (1, 3, 5, 5))
    bad = keras.Sequential([
        keras.layers.Input((5, 5, 3)),
        keras.layers.Conv2DTranspose(4, 3, dilation_rate=2),
    ])
    with pytest.raises(NotImplementedError, match="dilation_rate"):
        convert_keras_model(bad)


def test_lstm_gru_emit_tensor_iterator():
    """Keras LSTM/GRU convert to TensorIterator[LSTMCell/GRUCell] — the
    graph shape Model Optimizer emits for TF sequence models (the
    pipeline the reference documents, convert-model.sh:1-12) — with
    predict parity through both executors."""
    from keras import layers

    T, F = 12, 8
    km = keras.Sequential([
        keras.Input((T, F)),
        layers.LSTM(16, return_sequences=True),
        layers.GRU(12),
        layers.Dense(5, activation="softmax"),
    ])
    m = convert_keras_model(km, name="seq")
    tis = m.find_by_type("TensorIterator")
    assert len(tis) == 2
    cells = {n.op_type
             for ti in tis
             for n in ti.subgraphs["body"].model.nodes.values()}
    assert "LSTMCell" in cells and "GRUCell" in cells
    _parity(km, (1, T, F), atol=1e-5)


def test_lstm_return_sequences_false_takes_last_state():
    from keras import layers

    T, F = 7, 5
    km = keras.Sequential([
        keras.Input((T, F)),
        layers.LSTM(9),
    ])
    _parity(km, (1, T, F), atol=1e-5)


def test_lstm_go_backwards_refused():
    from keras import layers

    km = keras.Sequential([
        keras.Input((6, 4)),
        layers.LSTM(8, go_backwards=True),
    ])
    with pytest.raises(NotImplementedError, match="go_backwards"):
        convert_keras_model(km)
