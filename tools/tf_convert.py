"""Keras/TensorFlow → OpenVINO IR v10 converter.

THE reference pipeline, closed natively: the reference trains its models
in TF/Keras (reference: mnist-tf-training.py) and documents an external
Model Optimizer conversion it cannot run itself (convert-model.sh) — here
the Keras model converts directly into the typed IR, including MO's
``--scale`` folding (convert-model.sh:8-13 folds 1/255 into the first
layer's weights) and the NHWC→NCHW layout move (Flatten emits
Transpose(0,2,3,1)+Reshape so the flattened feature order matches Keras
exactly, the same rewrite MO performs).

Scope: ``keras.Sequential`` AND functional ``keras.Model`` graphs over
the CNN layer set — Conv2D / DepthwiseConv2D (valid+same padding, fused
activations), BatchNormalization (folded from the running statistics),
MaxPooling2D / AveragePooling2D / GlobalAveragePooling2D, Flatten,
Dense, Activation / ReLU / Softmax, ZeroPadding2D, UpSampling2D,
Rescaling, Dropout (erased), the merge layers (Add / Multiply /
Concatenate — residual and skip topologies), and the sequence layers
LSTM / GRU — each emitted as a TensorIterator[LSTMCell/GRUCell] body,
the exact graph shape Model Optimizer produces for TF sequence models
(ops/subgraph.py).  Functional models walk
Keras 3's node graph in topological (depth) order; anything unmapped
fails fast with the layer named.  Axis attributes translate from the
Keras NHWC convention to the IR's NCHW (channels: -1 → 1).

Usage:
    from tools.tf_convert import convert_keras_model
    model = convert_keras_model(keras_model, scale=255.0)
    write_ir_model(model, "net.xml")          # or compile_model(model)
"""

from __future__ import annotations

import numpy as np

from pyopenvino_tpu.ir.builder import GraphBuilder


def _pair(v):
    return tuple(int(x) for x in v) if isinstance(v, (tuple, list)) else (
        int(v), int(v))


def _same_pads(h, w, kh, kw, sh, sw):
    """TF SAME padding (extra on bottom/right — same_upper)."""
    def one(size, k, s):
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        return total // 2, total - total // 2
    (pt, pb), (pl, pr) = one(h, kh, sh), one(w, kw, sw)
    return (pt, pb), (pl, pr)


class _Converter:
    def __init__(self, b: GraphBuilder):
        self.b = b
        self.pending_scale = None  # 1/scale to fold into the first weights

    def _fold_scale(self, w, contraction_is_channel_last):
        """Apply MO --scale folding to the FIRST weight tensor."""
        if self.pending_scale is None:
            return w
        s = self.pending_scale
        self.pending_scale = None
        return w * s

    def _activation(self, x, act):
        b = self.b
        if act in (None, "linear"):
            return x
        if act == "relu":
            return b.relu(x)
        if act == "relu6":
            return b.clamp(x, 0.0, 6.0)
        if act == "sigmoid":
            return b.sigmoid(x)
        if act == "tanh":
            return b.tanh(x)
        if act == "softmax":
            # Keras softmax default axis -1 = channels (NHWC) → NCHW 1
            axis = 1 if len(x.shape) in (2, 4) else len(x.shape) - 1
            return b.softmax(x, axis=axis)
        if act == "gelu":
            return b.gelu(x)
        if act == "swish" or act == "silu":
            return b.swish(x)
        raise NotImplementedError(f"unmapped Keras activation {act!r}")

    def convert_layer(self, layer, x):
        import keras

        b = self.b
        name = type(layer).__name__
        cfg = layer.get_config()

        if name in ("Dropout", "InputLayer"):
            return x
        if name == "Rescaling":
            sc = np.float32(cfg["scale"])
            off = np.float32(cfg.get("offset", 0.0))
            y = b.multiply(x, b.const(sc))
            if float(off) != 0.0:
                y = b.add(y, b.const(off))
            return y
        if name == "ZeroPadding2D":
            (pt, pb), (pl, pr) = cfg["padding"]
            return b.pad(x, (0, 0, pt, pl), (0, 0, pb, pr))
        if name == "Conv2DTranspose":
            weights = layer.get_weights()
            k = weights[0]  # (kh, kw, Co, Ci)
            sh, sw = _pair(cfg["strides"])
            kh, kw = k.shape[:2]
            _, c, hin, win = x.shape
            if _pair(cfg.get("dilation_rate", 1)) != (1, 1):
                raise NotImplementedError(
                    "Conv2DTranspose with dilation_rate != 1 is "
                    "unsupported")
            # Keras 3 omits output_padding from get_config — read the
            # layer attribute
            cfg_opad = (cfg.get("output_padding")
                        if "output_padding" in cfg
                        else getattr(layer, "output_padding", None))
            if cfg["padding"] == "same":
                # Keras same-transpose: out = in*stride; OpenVINO pads
                # relation: out = (in-1)*s + k - pt - pb (+opad).
                # total = k - s distributed TF-style (extra at
                # bottom/right); opad absorbs any negative remainder
                total = max(kh - sh, 0)
                pt, pb = total // 2, total - total // 2
                total_w = max(kw - sw, 0)
                pl, pr = total_w // 2, total_w - total_w // 2
                oph = hin * sh - ((hin - 1) * sh + kh - pt - pb)
                opw = win * sw - ((win - 1) * sw + kw - pl - pr)
                pads, opad = ((pt, pb), (pl, pr)), (oph, opw)
            else:
                pads = ((0, 0), (0, 0))
                opad = _pair(cfg_opad) if cfg_opad is not None else (0, 0)
            if cfg["padding"] == "same" and cfg_opad is not None:
                raise NotImplementedError(
                    "Conv2DTranspose: explicit output_padding with "
                    "padding='same' is unsupported (same already pins "
                    "out = in * stride)")
            wt = self._fold_scale(k, True).transpose(3, 2, 0, 1)  # Ci,Co,kh,kw
            y = b.conv_transpose2d(
                x, b.const(wt.astype(np.float32)), strides=(sh, sw),
                pads=pads, output_padding=opad)
            if cfg.get("use_bias", True) and len(weights) > 1:
                y = b.add(y, b.const(
                    weights[-1].reshape(1, -1, 1, 1).astype(np.float32)))
            return self._activation(y, cfg.get("activation"))
        if name in ("Conv2D", "DepthwiseConv2D"):
            weights = layer.get_weights()
            k = weights[0]
            sh, sw = _pair(cfg["strides"])
            dh, dw = _pair(cfg.get("dilation_rate", 1))
            kh, kw = k.shape[:2]
            _, c, h, w = x.shape
            if cfg["padding"] == "same":
                pads = _same_pads(h, w, (kh - 1) * dh + 1,
                                  (kw - 1) * dw + 1, sh, sw)
            else:
                pads = ((0, 0), (0, 0))
            if name == "Conv2D":
                wt = self._fold_scale(k, True).transpose(3, 2, 0, 1)
                y = b.conv2d(x, b.const(wt.astype(np.float32)),
                             strides=(sh, sw), pads=pads,
                             dilations=(dh, dw))
            else:  # DepthwiseConv2D: (kh, kw, C, mult) → (C, mult, 1, kh, kw)
                kh_, kw_, ci, mult = k.shape
                wt = self._fold_scale(k, True).transpose(2, 3, 0, 1)
                wt = wt.reshape(ci, mult, 1, kh_, kw_)
                y = b.group_conv2d(x, b.const(wt.astype(np.float32)),
                                   strides=(sh, sw), pads=pads,
                                   dilations=(dh, dw))
            if cfg.get("use_bias", True) and len(weights) > 1:
                y = b.add(y, b.const(
                    weights[-1].reshape(1, -1, 1, 1).astype(np.float32)))
            return self._activation(y, cfg.get("activation"))
        if name == "BatchNormalization":
            eps = cfg["epsilon"]
            gamma, beta, mean, var = (w.astype(np.float64)
                                      for w in layer.get_weights())
            s = gamma / np.sqrt(var + eps)
            sh_ = beta - mean * s
            y = b.multiply(x, b.const(
                s.reshape(1, -1, 1, 1).astype(np.float32)))
            return b.add(y, b.const(
                sh_.reshape(1, -1, 1, 1).astype(np.float32)))
        if name in ("MaxPooling2D", "AveragePooling2D"):
            kh, kw = _pair(cfg["pool_size"])
            sh, sw = _pair(cfg["strides"] or cfg["pool_size"])
            _, c, h, w = x.shape
            pads = (_same_pads(h, w, kh, kw, sh, sw)
                    if cfg["padding"] == "same" else ((0, 0), (0, 0)))
            mk = b.max_pool if name == "MaxPooling2D" else b.avg_pool
            return mk(x, kernel=(kh, kw), strides=(sh, sw), pads=pads)
        if name == "GlobalAveragePooling2D":
            return b.reduce("Mean", x, axes=(2, 3),
                            keep_dims=bool(cfg.get("keepdims", False)))
        if name == "Flatten":
            if len(x.shape) == 4:
                # Keras flattens NHWC order: move channels last first —
                # the exact Transpose MO inserts at the layout boundary
                n, c, h, w = x.shape
                y = b.transpose(x, (0, 2, 3, 1))
                return b.reshape(y, (n, c * h * w))
            return b.reshape(x, (x.shape[0],
                                 int(np.prod(x.shape[1:]))))
        if name == "Dense":
            weights = layer.get_weights()
            wt = self._fold_scale(weights[0], False)
            y = b.matmul(x, b.const(wt.astype(np.float32)))
            if cfg.get("use_bias", True) and len(weights) > 1:
                y = b.add(y, b.const(
                    weights[-1].reshape(1, -1).astype(np.float32)))
            return self._activation(y, cfg.get("activation"))
        if name == "Activation":
            return self._activation(x, cfg["activation"])
        if name == "ReLU":
            mv = cfg.get("max_value")
            if mv is not None:
                return b.clamp(x, 0.0, float(mv))
            return b.relu(x)
        if name == "Softmax":
            axis = cfg.get("axis", -1)
            rank = len(x.shape)
            if axis in (-1, rank - 1):
                axis = 1 if rank in (2, 4) else rank - 1
            elif rank == 4:  # NHWC → NCHW axis translation
                axis = {0: 0, 1: 2, 2: 3, 3: 1}[axis % 4]
            return b.softmax(x, axis=int(axis))
        if name == "UpSampling2D":
            sh, sw = _pair(cfg["size"])
            sizes = (x.shape[2] * sh, x.shape[3] * sw)
            mode = {"nearest": "nearest", "bilinear": "linear"}.get(
                cfg.get("interpolation", "nearest"))
            if mode is None:
                raise NotImplementedError(
                    f"UpSampling2D interpolation "
                    f"{cfg.get('interpolation')!r}")
            return b.interpolate(x, sizes, mode=mode)
        if name in ("LSTM", "GRU"):
            return self._recurrent(layer, x, name)
        raise NotImplementedError(
            f"unmapped Keras layer {name} ({layer.name!r})")

    def _recurrent(self, layer, x, kind):
        """Keras LSTM/GRU → TensorIterator[LSTMCell/GRUCell] — the exact
        graph shape Model Optimizer emits for TF sequence models (the
        pipeline the reference documents, reference: convert-model.sh:1-12;
        subgraph machinery: ops/subgraph.py)."""
        b = self.b
        cfg = layer.get_config()
        if cfg.get("go_backwards"):
            raise NotImplementedError(
                f"{kind} {layer.name!r}: go_backwards=True is unsupported "
                f"(wrap forward layers; Keras reverses the OUTPUT order "
                f"too, which has no single-TI realization)")
        if cfg.get("return_state"):
            raise NotImplementedError(
                f"{kind} {layer.name!r}: return_state=True is unsupported")
        for k in ("activation", "recurrent_activation"):
            if cfg.get(k) not in ("tanh", "sigmoid", "relu"):
                raise NotImplementedError(
                    f"{kind} {layer.name!r}: {k}={cfg.get(k)!r} has no "
                    f"opset realization")
        units = int(cfg["units"])
        if len(x.shape) != 3:
            raise NotImplementedError(
                f"{kind} {layer.name!r}: expected rank-3 (1, T, F) input, "
                f"got {x.shape}")
        _, T, F = x.shape
        weights = layer.get_weights()
        kernel = self._fold_scale(weights[0], False)  # (F, GH)
        rec = weights[1]                              # (H, GH)
        g = 4 if kind == "LSTM" else 3

        if kind == "LSTM":
            # Keras gate order i,f,c,o → opset fico
            def reorder(a):
                i, f, c, o = np.split(a, 4, axis=-1)
                return np.concatenate([f, i, c, o], axis=-1)

            W = reorder(kernel).T.astype(np.float32)      # (4H, F)
            R = reorder(rec).T.astype(np.float32)         # (4H, H)
            if cfg.get("use_bias", True):
                B = reorder(weights[2].reshape(1, -1))[0]
            else:
                B = np.zeros(g * units)
            B = B.astype(np.float32)
            acts = (f"{cfg['recurrent_activation']},{cfg['activation']},"
                    f"{cfg['activation']}")
            cell_attrs = {"hidden_size": units, "activations": acts}
            cell_op, n_state = "LSTMCell", 2
        else:
            # Keras GRU order z,r,h == opset zrh; reset_after=True is the
            # opset's linear_before_reset form (B = [bz, br, Wbh, Rbh])
            W = kernel.T.astype(np.float32)
            R = rec.T.astype(np.float32)
            reset_after = bool(cfg.get("reset_after", True))
            if not reset_after:
                raise NotImplementedError(
                    f"GRU {layer.name!r}: reset_after=False is the legacy "
                    f"CuDNN-incompatible variant; retrain with the default "
                    f"reset_after=True")
            if cfg.get("use_bias", True):
                wb, rb = weights[2]  # (2, 3H): input-side, recurrent-side
                B = np.concatenate([
                    wb[:units] + rb[:units],
                    wb[units:2 * units] + rb[units:2 * units],
                    wb[2 * units:], rb[2 * units:],
                ])
            else:
                B = np.zeros(4 * units)
            B = B.astype(np.float32)
            acts = f"{cfg['recurrent_activation']},{cfg['activation']}"
            cell_attrs = {"hidden_size": units, "activations": acts,
                          "linear_before_reset": "1"}
            cell_op, n_state = "GRUCell", 1

        bb = GraphBuilder(f"{layer.name}_cell")
        xt = bb.parameter("x_t", (1, 1, F))
        states = [bb.parameter(f"s{i}_in", (1, units))
                  for i in range(n_state)]
        xf = bb.reshape(xt, (1, F))
        cell_out = bb._add_node(
            cell_op, [xf] + states + [bb.const(W), bb.const(R),
                                      bb.const(B)], cell_attrs)
        outs = cell_out if isinstance(cell_out, list) else [cell_out]
        for i, p in enumerate(outs):
            bb.result(p, f"s{i}_out")
        bb.result(bb.reshape(outs[0], (1, 1, units)), "y_out")
        body = bb.build()

        inits = [b.const(np.zeros((1, units), np.float32),
                         f"{layer.name}_s{i}0") for i in range(n_state)]
        out_map = ([("y_out", {"axis": 1})] if cfg.get("return_sequences")
                   else ["s0_out"])
        return b.tensor_iterator(
            [x] + inits, body,
            input_map=[("x_t", {"axis": 1})]
            + [f"s{i}_in" for i in range(n_state)],
            output_map=out_map,
            back_edges=[(f"s{i}_out", f"s{i}_in")
                        for i in range(n_state)],
            name=layer.name)

    def convert_merge(self, layer, ins):
        """Multi-input merge layers (functional graphs)."""
        b = self.b
        name = type(layer).__name__
        if name == "Add":
            out = ins[0]
            for p in ins[1:]:
                out = b.add(out, p)
            return out
        if name == "Multiply":
            out = ins[0]
            for p in ins[1:]:
                out = b.multiply(out, p)
            return out
        if name == "Concatenate":
            axis = layer.get_config().get("axis", -1)
            rank = len(ins[0].shape)
            if rank == 4:
                axis = {0: 0, 1: 2, 2: 3, 3: 1}[axis % 4]
            else:
                axis = axis % rank
            return b.concat(list(ins), axis=int(axis))
        raise NotImplementedError(
            f"unmapped multi-input Keras layer {name} ({layer.name!r})")


def convert_keras_model(kmodel, scale=None, name=None, input_name="data"):
    """keras.Sequential → typed IR Model (NCHW).

    ``scale``: Model Optimizer ``--scale`` parity — 1/scale is folded
    into the first weight tensor, so callers feed RAW 0..scale pixels
    (reference: convert-model.sh:8-13).  The Keras model itself keeps
    normalized inputs; only the IR changes."""
    import keras

    b = GraphBuilder(name or getattr(kmodel, "name", "keras_model"))
    conv = _Converter(b)
    if scale is not None:
        conv.pending_scale = 1.0 / float(scale)

    def to_nchw_shape(ks):
        if len(ks) == 4:
            _, h, w, c = ks
            return (1, int(c), int(h), int(w))
        if len(ks) == 3:  # sequence input (1, T, F) — no layout move
            return (1, int(ks[1]), int(ks[2]))
        return (1, int(ks[1]))

    if isinstance(kmodel, keras.Sequential):
        x = b.parameter(input_name, to_nchw_shape(kmodel.input_shape))
        for layer in kmodel.layers:
            x = conv.convert_layer(layer, x)
        b.result(x, "output")
        return b.build()

    # functional keras.Model: walk the node graph deepest-first
    # (inputs → outputs), mapping KerasTensor → Port
    if not hasattr(kmodel, "_nodes_by_depth"):
        raise NotImplementedError(
            "convert_keras_model supports Sequential and functional "
            "keras.Model graphs (subclassed models have no static graph "
            "to walk — use tools/torch_convert.py-style tracing)")
    env = {}
    n_inputs = len(kmodel.inputs)
    for depth in sorted(kmodel._nodes_by_depth, reverse=True):
        for node in kmodel._nodes_by_depth[depth]:
            op = node.operation
            outs = list(node.output_tensors)
            if isinstance(op, keras.layers.InputLayer):
                t = outs[0]
                pname = (input_name if n_inputs == 1
                         else getattr(t, "name", input_name))
                env[t.name] = b.parameter(
                    pname, to_nchw_shape(tuple(t.shape)))
                continue
            ins = [env[t.name] for t in node.input_tensors]
            if len(ins) > 1:
                out = conv.convert_merge(op, ins)
            else:
                out = conv.convert_layer(op, ins[0])
            if len(outs) != 1:
                raise NotImplementedError(
                    f"multi-output Keras layer {type(op).__name__}")
            env[outs[0].name] = out
    for i, t in enumerate(kmodel.outputs):
        b.result(env[t.name], f"output{i}" if i else "output")
    return b.build()
