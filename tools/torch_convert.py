"""PyTorch → OpenVINO IR v10 converter (torch.fx front-end).

The reference ecosystem reaches the engine through Model Optimizer
conversions of TF models (reference: convert-model.sh / mnist-tf-training.py);
this is the equivalent on-ramp for PyTorch users: an ``nn.Module`` is
symbolically traced with ``torch.fx``, every traced node is mapped onto the
typed GraphBuilder (pyopenvino_tpu/ir/builder.py), and the result is a
Model that serializes via ir/writer.py, compiles via runtime/compiler.py,
quantizes, shards and exports like any parsed IR.

Conversion choices (standard MO behavior):
  * eval-mode semantics: BatchNorm folds into per-channel Multiply→Add
    from the RUNNING statistics; Dropout/Identity erase.
  * ``nn.Linear`` becomes MatMul(transpose_b=1) + Add — the IR's native
    spelling of y = x·Wᵀ + b.
  * grouped ``nn.Conv2d`` emits GroupConvolution with the (G, Co/G,
    Ci/G, kh, kw) weight layout the IR declares.
  * shape-consuming ops (flatten / view / reshape) resolve their targets
    from the builder's inferred port shapes at convert time — static
    shapes, like every IR.

Anything untraceable or unmapped fails fast with the torch op named —
never a silently-wrong graph.

Usage:
    from tools.torch_convert import convert_torch_module
    model = convert_torch_module(net, (1, 3, 224, 224))
    write_ir_model(model, "net.xml")              # or compile_model(model)
"""

from __future__ import annotations

import operator

import numpy as np

from pyopenvino_tpu.ir.builder import GraphBuilder


def _np(t):
    return t.detach().cpu().numpy().astype(np.float32)


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (int(v), int(v))


class _Converter:
    def __init__(self, gm, example_shape, name, input_name):
        self.gm = gm
        self.b = GraphBuilder(name)
        self.example_shape = tuple(int(d) for d in example_shape)
        self.input_name = input_name
        self.env = {}

    # -- module-level mappings ------------------------------------------------

    def _conv2d(self, mod, x):
        import torch.nn as nn

        assert isinstance(mod, nn.Conv2d)
        if isinstance(mod.padding, str):
            raise NotImplementedError(
                "Conv2d string padding modes are unsupported — use ints")
        ph, pw = _pair(mod.padding)
        w = _np(mod.weight)  # (Co, Ci/G, kh, kw)
        if mod.groups == 1:
            y = self.b.conv2d(
                x, self.b.const(w), strides=_pair(mod.stride),
                pads=((ph, ph), (pw, pw)), dilations=_pair(mod.dilation))
        else:
            g = mod.groups
            co, cig, kh, kw = w.shape
            wg = w.reshape(g, co // g, cig, kh, kw)
            y = self.b.group_conv2d(
                x, self.b.const(wg), strides=_pair(mod.stride),
                pads=((ph, ph), (pw, pw)), dilations=_pair(mod.dilation))
        if mod.bias is not None:
            y = self.b.add(
                y, self.b.const(_np(mod.bias).reshape(1, -1, 1, 1)))
        return y

    def _bn2d(self, mod, x):
        # affine=False leaves weight/bias as None; eval semantics are then
        # gamma=1, beta=0 (normalize only).
        gamma = (np.ones_like(_np(mod.running_var)) if mod.weight is None
                 else _np(mod.weight))
        beta = (np.zeros_like(_np(mod.running_mean)) if mod.bias is None
                else _np(mod.bias))
        s = gamma / np.sqrt(_np(mod.running_var) + mod.eps)
        sh = beta - _np(mod.running_mean) * s
        y = self.b.multiply(x, self.b.const(s.reshape(1, -1, 1, 1)))
        return self.b.add(y, self.b.const(sh.reshape(1, -1, 1, 1)))

    def _linear(self, mod, x):
        y = self.b.matmul(x, self.b.const(_np(mod.weight)),
                          transpose_b=True)
        if mod.bias is not None:
            y = self.b.add(y, self.b.const(_np(mod.bias).reshape(1, -1)))
        return y

    def _maxpool(self, mod, x):
        ph, pw = _pair(mod.padding)
        return self.b.max_pool(
            x, kernel=_pair(mod.kernel_size),
            strides=_pair(mod.stride or mod.kernel_size),
            pads=((ph, ph), (pw, pw)),
            rounding="ceil" if mod.ceil_mode else "floor")

    def _avgpool(self, mod, x):
        ph, pw = _pair(mod.padding)
        if (ph or pw) and getattr(mod, "count_include_pad", True):
            raise NotImplementedError(
                "AvgPool2d with padding and count_include_pad=True does "
                "not match the IR's exclude-pad AvgPool — set "
                "count_include_pad=False or padding=0")
        return self.b.avg_pool(
            x, kernel=_pair(mod.kernel_size),
            strides=_pair(mod.stride or mod.kernel_size),
            pads=((ph, ph), (pw, pw)))

    def _flatten_port(self, x, start_dim=1):
        shape = x.shape
        lead = shape[:start_dim]
        flat = int(np.prod(shape[start_dim:]))
        return self.b.reshape(x, tuple(lead) + (flat,))

    def call_module(self, node):
        import torch.nn as nn

        mod = self.gm.get_submodule(node.target)
        x = self.env[node.args[0]]
        if isinstance(mod, nn.ConvTranspose2d):
            if mod.groups != 1:
                raise NotImplementedError(
                    "grouped ConvTranspose2d is unsupported")
            ph, pw = _pair(mod.padding)
            oph, opw = _pair(mod.output_padding)
            y = self.b.conv_transpose2d(
                x, self.b.const(_np(mod.weight)),  # torch (Ci, Co, kh, kw)
                strides=_pair(mod.stride), pads=((ph, ph), (pw, pw)),
                dilations=_pair(mod.dilation), output_padding=(oph, opw))
            if mod.bias is not None:
                y = self.b.add(y, self.b.const(
                    _np(mod.bias).reshape(1, -1, 1, 1)))
            return y
        if isinstance(mod, nn.Conv2d):
            return self._conv2d(mod, x)
        if isinstance(mod, nn.BatchNorm2d):
            return self._bn2d(mod, x)
        if isinstance(mod, nn.Linear):
            return self._linear(mod, x)
        if isinstance(mod, nn.MaxPool2d):
            return self._maxpool(mod, x)
        if isinstance(mod, nn.AvgPool2d):
            return self._avgpool(mod, x)
        if isinstance(mod, nn.AdaptiveAvgPool2d):
            out = mod.output_size
            if _pair(out) != (1, 1):
                raise NotImplementedError(
                    "AdaptiveAvgPool2d only supports output_size (1, 1)")
            return self.b.reduce("Mean", x, axes=(2, 3), keep_dims=True)
        if isinstance(mod, nn.ReLU):
            return self.b.relu(x)
        if isinstance(mod, nn.ReLU6):
            return self.b.clamp(x, 0.0, 6.0)
        if isinstance(mod, nn.Hardtanh):
            return self.b.clamp(x, float(mod.min_val), float(mod.max_val))
        if isinstance(mod, nn.LeakyReLU):
            return self.b.prelu(x, float(mod.negative_slope))
        if isinstance(mod, nn.Sigmoid):
            return self.b.sigmoid(x)
        if isinstance(mod, nn.SiLU):
            return self.b.swish(x)
        if isinstance(mod, nn.Hardswish):
            return self.b.hswish(x)
        if isinstance(mod, nn.GELU):
            return self.b.gelu(
                x, mode="tanh" if mod.approximate == "tanh" else "erf")
        if isinstance(mod, nn.ELU):
            return self.b.elu(x, float(mod.alpha))
        if isinstance(mod, nn.Softmax):
            return self.b.softmax(x, axis=int(mod.dim))
        if isinstance(mod, nn.Flatten):
            return self._flatten_port(x, mod.start_dim)
        if isinstance(mod, (nn.Dropout, nn.Identity)):
            return x
        if isinstance(mod, nn.Upsample):
            if mod.scale_factor is None:
                raise NotImplementedError("Upsample needs scale_factor")
            sf = _pair(mod.scale_factor)
            sizes = (int(x.shape[2] * sf[0]), int(x.shape[3] * sf[1]))
            mode = {"nearest": "nearest", "bilinear": "linear"}.get(mod.mode)
            if mode is None:
                raise NotImplementedError(
                    f"Upsample mode {mod.mode!r} unsupported")
            return self.b.interpolate(
                x, sizes, mode=mode,
                align_corners=bool(mod.align_corners))
        if isinstance(mod, (nn.LSTM, nn.GRU)):
            extra = (len(node.args) > 1 and node.args[1] is not None) or \
                any(v is not None for v in node.kwargs.values())
            if extra:
                raise NotImplementedError(
                    f"{type(mod).__name__} with an explicit initial state "
                    f"is unsupported — the conversion zero-initializes; "
                    f"drop the state argument or fold it into the model")
            return (self._lstm(mod, x) if isinstance(mod, nn.LSTM)
                    else self._gru(mod, x))
        raise NotImplementedError(
            f"unmapped torch module {type(mod).__name__} at {node.target!r}")

    def _recurrent_ti(self, kind, mod, x, n_state, W, R, B_, cell_attrs):
        """Shared nn.LSTM / nn.GRU → TensorIterator[cell] scaffold — the
        same MO graph shape the Keras on-ramp emits
        (tools/tf_convert.py _recurrent; ops/subgraph.py).  Scope:
        single layer, unidirectional, batch_first=True, rank-3 (1, T, F)
        input.  Returns the per-cell outputs of one TI:
        (Y, [final states...])."""
        if (mod.num_layers != 1 or mod.bidirectional
                or not mod.batch_first or mod.dropout):
            raise NotImplementedError(
                f"{kind}: only single-layer unidirectional "
                f"batch_first=True without dropout is supported")
        if len(x.shape) != 3:
            raise NotImplementedError(
                f"{kind}: expected rank-3 (1, T, F) batch_first input, "
                f"got {x.shape} (unbatched (T, F) calls are unsupported)")
        n, _T, F_ = x.shape
        if n != 1:
            raise NotImplementedError(
                f"{kind} conversion supports batch 1 (got example batch "
                f"{n}) — batch via infer_batch like every family")
        b = self.b
        H = mod.hidden_size
        bb = GraphBuilder(f"{kind.lower()}_cell")
        xt = bb.parameter("x_t", (1, 1, F_))
        states = [bb.parameter(f"s{i}_in", (1, H)) for i in range(n_state)]
        xf = bb.reshape(xt, (1, F_))
        w, r, bias = bb.const(W), bb.const(R), bb.const(B_)
        if n_state == 2:
            outs = list(bb.lstm_cell(xf, states[0], states[1], w, r, bias,
                                     hidden_size=H, **cell_attrs))
        else:
            outs = [bb.gru_cell(xf, states[0], w, r, bias,
                                hidden_size=H, **cell_attrs)]
        for i, p in enumerate(outs):
            bb.result(p, f"s{i}_out")
        bb.result(bb.reshape(outs[0], (1, 1, H)), "y_out")

        inits = [b.const(np.zeros((1, H), np.float32))
                 for _ in range(n_state)]
        res = b.tensor_iterator(
            [x] + inits, bb.build(),
            input_map=[("x_t", {"axis": 1})]
            + [f"s{i}_in" for i in range(n_state)],
            output_map=[("y_out", {"axis": 1})]
            + [f"s{i}_out" for i in range(n_state)],
            back_edges=[(f"s{i}_out", f"s{i}_in")
                        for i in range(n_state)])
        # torch final states carry a (num_layers, B, H) leading dim
        return res[0], [b.reshape(s, (1, 1, H)) for s in res[1:]]

    def _lstm(self, mod, x):
        """nn.LSTM: torch gates i,f,g,o reorder to opset fico; ih/hh
        biases sum.  Returns the torch result tuple (output, (h_n, c_n))
        of Ports; fx getitem indexes into it."""
        H = mod.hidden_size

        def reorder(a):
            i, f, g, o = np.split(a, 4, axis=0)
            return np.concatenate([f, i, g, o], axis=0)

        W = reorder(_np(mod.weight_ih_l0)).astype(np.float32)  # (4H, F)
        R = reorder(_np(mod.weight_hh_l0)).astype(np.float32)  # (4H, H)
        B_ = (reorder(_np(mod.bias_ih_l0)
                      + _np(mod.bias_hh_l0)).astype(np.float32)
              if mod.bias else np.zeros(4 * H, np.float32))
        y, (hn, cn) = self._recurrent_ti(
            "nn.LSTM", mod, x, 2, W, R, B_, {})
        return (y, (hn, cn))

    def _gru(self, mod, x):
        """nn.GRU: torch's candidate resets AFTER the hidden linear —
        the opset's linear_before_reset form; gates reorder r,z,n →
        z,r,n and the biases map to B = [bz, br, Wbh, Rbh] (same layout
        the Keras reset_after on-ramp emits, tools/tf_convert.py)."""
        H = mod.hidden_size

        def reorder(a):
            r, z, nn_ = np.split(a, 3, axis=0)
            return np.concatenate([z, r, nn_], axis=0)

        W = reorder(_np(mod.weight_ih_l0)).astype(np.float32)  # (3H, F)
        R = reorder(_np(mod.weight_hh_l0)).astype(np.float32)  # (3H, H)
        if mod.bias:
            bi = reorder(_np(mod.bias_ih_l0))
            bh = reorder(_np(mod.bias_hh_l0))
            B_ = np.concatenate([
                bi[:2 * H] + bh[:2 * H],   # bz, br (combined)
                bi[2 * H:], bh[2 * H:],    # Wbh, Rbh (kept apart)
            ]).astype(np.float32)
        else:
            B_ = np.zeros(4 * H, np.float32)
        y, (hn,) = self._recurrent_ti(
            "nn.GRU", mod, x, 1, W, R, B_,
            {"linear_before_reset": "1"})
        return (y, hn)

    def _tensor_getitem(self, x, idx):
        """Tensor indexing with full slices and integer axes (the
        ``y[:, -1]`` last-timestep read after an LSTM): each int picks
        one index (Gather) and drops the axis."""
        if not isinstance(idx, tuple):
            idx = (idx,)
        out, dropped = x, 0
        for ax, it in enumerate(idx):
            if isinstance(it, slice):
                if it != slice(None):
                    raise NotImplementedError(
                        f"tensor getitem: only ':' slices supported, "
                        f"got {it}")
                continue
            if isinstance(it, int):
                eff = ax - dropped
                it = it % out.shape[eff]
                g = self.b.gather(out, [it], axis=eff)
                shp = list(g.shape)
                del shp[eff]
                out = self.b.reshape(g, tuple(shp))
                dropped += 1
                continue
            raise NotImplementedError(
                f"tensor getitem: unsupported index {it!r}")
        return out

    # -- function / method mappings -------------------------------------------

    def call_function(self, node):
        import torch
        import torch.nn.functional as F

        fn = node.target
        a = node.args

        def p(i):
            v = a[i]
            if v in self.env:
                return self.env[v]
            # python scalar operand (x * 0.5, x + 2): lift to a Const so
            # the binary builders see a Port, not a float
            if isinstance(v, (int, float)):
                return self.b.const(np.float32(v))
            return v

        if fn is operator.getitem:
            src = self.env[a[0]] if a[0] in self.env else a[0]
            if isinstance(src, (tuple, list)):
                # container results (nn.LSTM's (output, (h_n, c_n)))
                return src[a[1]]
            return self._tensor_getitem(src, a[1])
        if fn in (operator.add, torch.add):
            return self.b.add(p(0), p(1))
        if fn in (operator.mul, torch.mul):
            return self.b.multiply(p(0), p(1))
        if fn in (F.relu, torch.relu):
            return self.b.relu(p(0))
        if fn is F.relu6:
            return self.b.clamp(p(0), 0.0, 6.0)
        if fn in (torch.sigmoid, F.sigmoid):
            return self.b.sigmoid(p(0))
        if fn is F.silu:
            return self.b.swish(p(0))
        if fn is F.gelu:
            return self.b.gelu(
                p(0),
                mode="tanh"
                if node.kwargs.get("approximate") == "tanh" else "erf")
        if fn is F.leaky_relu:
            slope = a[1] if len(a) > 1 else node.kwargs.get(
                "negative_slope", 0.01)
            return self.b.prelu(p(0), float(slope))
        if fn is F.softmax:
            axis = a[1] if len(a) > 1 else node.kwargs.get("dim")
            return self.b.softmax(p(0), axis=int(axis))
        if fn is torch.flatten:
            start = a[1] if len(a) > 1 else node.kwargs.get("start_dim", 0)
            return self._flatten_port(p(0), int(start))
        if fn is torch.cat:
            parts = [self.env[t] for t in a[0]]
            axis = a[1] if len(a) > 1 else node.kwargs.get("dim", 0)
            return self.b.concat(parts, axis=int(axis))
        if fn is F.adaptive_avg_pool2d:
            if _pair(a[1]) != (1, 1):
                raise NotImplementedError(
                    "adaptive_avg_pool2d only supports output size (1, 1)")
            return self.b.reduce("Mean", p(0), axes=(2, 3), keep_dims=True)
        if fn is torch.mean:
            x = p(0)
            dims = a[1] if len(a) > 1 else node.kwargs.get("dim")
            keep = node.kwargs.get("keepdim", False)
            if dims is None:  # full reduction to a scalar
                dims = tuple(range(len(x.shape)))
            dims = (dims,) if isinstance(dims, int) else tuple(dims)
            return self.b.reduce("Mean", x, axes=dims, keep_dims=keep)
        raise NotImplementedError(
            f"unmapped torch function {getattr(fn, '__name__', fn)!r}")

    def call_method(self, node):
        x = self.env[node.args[0]]
        m = node.target
        if m in ("view", "reshape"):
            dims = node.args[1:]
            if len(dims) == 1 and isinstance(dims[0], (tuple, list)):
                dims = tuple(dims[0])
            total = int(np.prod(x.shape))
            known = int(np.prod([d for d in dims if d != -1]))
            target = tuple(
                total // known if d == -1 else int(d) for d in dims)
            return self.b.reshape(x, target)
        if m == "flatten":
            start = node.args[1] if len(node.args) > 1 else 0
            return self._flatten_port(x, int(start))
        if m == "permute":
            perm = node.args[1:]
            if len(perm) == 1 and isinstance(perm[0], (tuple, list)):
                perm = tuple(perm[0])
            return self.b.transpose(x, tuple(int(d) for d in perm))
        if m == "mean":
            dims = node.args[1] if len(node.args) > 1 else node.kwargs.get(
                "dim")
            keep = node.kwargs.get("keepdim", False)
            if dims is None:  # full reduction to a scalar
                dims = tuple(range(len(x.shape)))
            dims = (dims,) if isinstance(dims, int) else tuple(dims)
            return self.b.reduce("Mean", x, axes=dims, keep_dims=keep)
        if m == "sigmoid":
            return self.b.sigmoid(x)
        if m == "contiguous":
            return x
        raise NotImplementedError(f"unmapped tensor method {m!r}")

    # -- driver ---------------------------------------------------------------

    def run(self):
        for node in self.gm.graph.nodes:
            if node.op == "placeholder":
                self.env[node] = self.b.parameter(
                    self.input_name, self.example_shape)
            elif node.op == "get_attr":
                t = self.gm
                for part in node.target.split("."):
                    t = getattr(t, part)
                self.env[node] = self.b.const(_np(t))
            elif node.op == "call_module":
                self.env[node] = self.call_module(node)
            elif node.op == "call_function":
                self.env[node] = self.call_function(node)
            elif node.op == "call_method":
                self.env[node] = self.call_method(node)
            elif node.op == "output":
                arg = node.args[0]
                outs = arg if isinstance(arg, (tuple, list)) else (arg,)
                for i, o in enumerate(outs):
                    self.b.result(self.env[o], f"output{i}" if i else
                                  "output")
            else:  # pragma: no cover
                raise NotImplementedError(f"fx op {node.op!r}")
        return self.b.build()


def convert_torch_module(module, example_shape, name="torch_model",
                         input_name="data"):
    """nn.Module (eval semantics) → typed IR Model.  ``example_shape`` is
    the static input shape, e.g. (1, 3, 224, 224)."""
    import torch.fx as fx

    module = module.eval()
    gm = fx.symbolic_trace(module)
    return _Converter(gm, example_shape, name, input_name).run()
