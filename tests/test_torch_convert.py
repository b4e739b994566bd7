"""PyTorch → IR converter (tools/torch_convert.py).

Every converted module is checked against the torch eval forward itself
(the strongest possible oracle), then through the usual engine surfaces:
XLA backend, INT8 weight-only quantization, and the writer round trip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pyopenvino_tpu.config import Config, QuantMode
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.interpreter import Interpreter
from tools.torch_convert import convert_torch_module


def _parity(net, shape, seed=0, atol=1e-5):
    torch.manual_seed(seed)
    net = net.eval()
    m = convert_torch_module(net, shape)
    x = np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    ref = Interpreter(m).run({"data": x})
    got = compile_model(m, Config())({"data": x})
    k = next(iter(ref))
    np.testing.assert_allclose(ref[k], want, rtol=1e-4, atol=atol)
    np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=atol)
    return m, x, want


class _Block(nn.Module):
    def __init__(self, ci, co, stride=1):
        super().__init__()
        self.c1 = nn.Conv2d(ci, co, 3, stride, 1, bias=False)
        self.b1 = nn.BatchNorm2d(co)
        self.c2 = nn.Conv2d(co, co, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(co)
        self.down = (nn.Conv2d(ci, co, 1, stride, bias=False)
                     if stride != 1 or ci != co else nn.Identity())

    def forward(self, x):
        y = torch.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return torch.relu(y + self.down(x))


class _TinyResNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Conv2d(3, 16, 3, 1, 1)
        self.bn = nn.BatchNorm2d(16)
        self.pool = nn.MaxPool2d(2, 2)
        self.blk1 = _Block(16, 32, 2)
        self.blk2 = _Block(32, 32)
        self.gap = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(32, 10)
        self.drop = nn.Dropout(0.2)

    def forward(self, x):
        y = self.pool(torch.relu(self.bn(self.stem(x))))
        y = self.blk2(self.blk1(y))
        y = torch.flatten(self.gap(y), 1)
        return self.fc(self.drop(y))


def _trained_bn(net, shape):
    """Run a few train-mode batches so BN running stats are non-trivial —
    the fold must reproduce REAL statistics, not the init."""
    with torch.no_grad():
        net.train()
        for s in range(3):
            net(torch.randn(8, *shape[1:], generator=torch.Generator()
                            .manual_seed(s)))
    return net.eval()


def test_resnet_style_parity():
    net = _trained_bn(_TinyResNet(), (1, 3, 32, 32))
    m, x, want = _parity(net, (1, 3, 32, 32))
    # BN folded: no BatchNorm survives, Multiply/Add pairs do
    assert not any("BatchNorm" in n.op_type for n in m.nodes.values())


def test_mobilenet_style_depthwise_relu6_hswish():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 16, 3, 2, 1)
            self.dw = nn.Conv2d(16, 16, 3, 1, 1, groups=16)
            self.pw = nn.Conv2d(16, 24, 1)
            self.act = nn.ReLU6()
            self.hs = nn.Hardswish()
            self.gap = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(24, 5)

        def forward(self, x):
            y = self.act(self.c1(x))
            y = self.act(self.dw(y))
            y = self.hs(self.pw(y))
            return self.fc(torch.flatten(self.gap(y), 1))

    m, _, _ = _parity(Net(), (1, 3, 32, 32))
    assert any(n.op_type == "GroupConvolution" for n in m.nodes.values())


def test_unet_style_upsample_cat():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = nn.Conv2d(3, 8, 3, 1, 1)
            self.e2 = nn.Conv2d(8, 16, 3, 2, 1)
            self.up = nn.Upsample(scale_factor=2, mode="nearest")
            self.d1 = nn.Conv2d(24, 8, 3, 1, 1)
            self.head = nn.Conv2d(8, 2, 1)

        def forward(self, x):
            a = F.relu(self.e1(x))
            b = F.relu(self.e2(a))
            y = torch.cat([self.up(b), a], 1)
            return self.head(F.relu(self.d1(y)))

    _parity(Net(), (1, 3, 16, 16))


def test_activation_zoo_and_methods():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 8, 3, 1, 1)
            self.leaky = nn.LeakyReLU(0.1)
            self.elu = nn.ELU(0.7)
            self.gelu = nn.GELU()
            self.silu = nn.SiLU()
            self.fc = nn.Linear(8, 6)

        def forward(self, x):
            y = self.silu(self.gelu(self.elu(self.leaky(self.c(x)))))
            y = y.mean((2, 3))
            return F.softmax(self.fc(y), dim=1)

    _parity(Net(), (1, 3, 12, 12))


def test_scalar_operands_and_full_mean():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 8, 3, 1, 1)

        def forward(self, x):
            y = self.c(x) * 0.5 + 1.0
            return y.mean()

    _parity(Net(), (1, 3, 8, 8))


def test_view_permute_methods():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 8, 3, 1, 1)
            self.fc = nn.Linear(8, 4)

        def forward(self, x):
            y = self.c(x).permute(0, 2, 3, 1).contiguous()
            y = y.reshape(1, -1, 8)
            return self.fc(y.mean(1))

    _parity(Net(), (1, 3, 10, 10))


def test_ceil_mode_pool_and_avgpool():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 8, 3, 1, 1)
            self.mp = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.ap = nn.AvgPool2d(2, 2)

        def forward(self, x):
            return self.ap(self.mp(torch.relu(self.c(x))))

    _parity(Net(), (1, 3, 15, 15))


def test_converted_model_quantizes_and_roundtrips(tmp_path):
    """A converted torch model is a first-class IR citizen: INT8
    weight-only compiles with quantized convs, and the writer round-trip
    is exact."""
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.ir.writer import write_ir_model

    net = _trained_bn(_TinyResNet(), (1, 3, 32, 32))
    m, x, want = _parity(net, (1, 3, 32, 32))
    q = compile_model(m, Config(quant=QuantMode.INT8_WEIGHT))
    out = q({"data": x})
    k = next(iter(out))
    assert np.argmax(out[k]) == np.argmax(want)
    assert q._quantized  # convs/matmuls actually went int8

    p = str(tmp_path / "converted.xml")
    write_ir_model(m, p)
    m2 = read_ir_model(p)
    ref2 = Interpreter(m2).run({"data": x})
    np.testing.assert_allclose(ref2[k], want, rtol=1e-4, atol=1e-5)


def test_unmapped_module_fails_fast():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.EmbeddingBag(4, 8)

        def forward(self, x):
            return self.emb(x)

    with pytest.raises(Exception, match="EmbeddingBag|unmapped|trace"):
        convert_torch_module(Net(), (1, 4))


def test_conv_transpose2d():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.d = nn.Conv2d(3, 8, 3, 2, 1)
            self.u = nn.ConvTranspose2d(8, 4, 2, 2)

        def forward(self, x):
            return self.u(F.relu(self.d(x)))

    _parity(Net(), (1, 3, 16, 16))


def test_lstm_emits_tensor_iterator():
    """nn.LSTM converts to TensorIterator[LSTMCell] (the same MO graph
    shape the Keras on-ramp emits) with forward parity, including the
    fx getitem paths: tuple unpacking of (output, (h_n, c_n)) and the
    y[:, -1] last-timestep tensor index."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    T, F, H = 9, 5, 7

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(F, H, batch_first=True)
            self.fc = nn.Linear(H, 4)

        def forward(self, x):
            y, (_hn, _cn) = self.lstm(x)
            return self.fc(y[:, -1])

    mod = M().eval()
    m = convert_torch_module(mod, (1, T, F))
    ti = m.find_by_type("TensorIterator")
    assert len(ti) == 1
    assert ti[0].subgraphs["body"].model.find_by_type("LSTMCell")
    x = np.random.default_rng(0).standard_normal((1, T, F)).astype(
        np.float32)
    want = mod(torch.from_numpy(x)).detach().numpy()
    ref = next(iter(Interpreter(m).run({"data": x}).values()))
    np.testing.assert_allclose(ref, want, rtol=1e-5, atol=1e-6)
    got = next(iter(compile_model(m, Config())({"data": x}).values()))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lstm_unsupported_configs_refused():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(4, 6, batch_first=True,
                                bidirectional=True)

        def forward(self, x):
            return self.lstm(x)[0]

    with pytest.raises(NotImplementedError, match="unidirectional"):
        convert_torch_module(M().eval(), (1, 5, 4))


def test_lstm_explicit_initial_state_refused():
    """A user-supplied (h0, c0) must refuse loudly — silently
    zero-initializing computes wrong values."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(4, 6, batch_first=True)
            self.register_buffer("h0", torch.randn(1, 1, 6))
            self.register_buffer("c0", torch.randn(1, 1, 6))

        def forward(self, x):
            return self.lstm(x, (self.h0, self.c0))[0]

    with pytest.raises(NotImplementedError, match="initial state"):
        convert_torch_module(M().eval(), (1, 5, 4))


def test_gru_emits_tensor_iterator():
    """nn.GRU converts to TensorIterator[GRUCell linear_before_reset]
    (torch's candidate resets after the hidden linear) with parity —
    gate reorder r,z,n -> z,r,n and the [bz, br, Wbh, Rbh] bias map."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    T, F, H = 8, 5, 6

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = nn.GRU(F, H, batch_first=True)
            self.fc = nn.Linear(H, 3)

        def forward(self, x):
            y, _hn = self.gru(x)
            return self.fc(y[:, -1])

    mod = M().eval()
    m = convert_torch_module(mod, (1, T, F))
    ti = m.find_by_type("TensorIterator")
    assert len(ti) == 1
    assert ti[0].subgraphs["body"].model.find_by_type("GRUCell")
    x = np.random.default_rng(0).standard_normal((1, T, F)).astype(
        np.float32)
    want = mod(torch.from_numpy(x)).detach().numpy()
    ref = next(iter(Interpreter(m).run({"data": x}).values()))
    np.testing.assert_allclose(ref, want, rtol=1e-5, atol=1e-6)
    got = next(iter(compile_model(m, Config())({"data": x}).values()))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
