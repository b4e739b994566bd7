"""Shape-manipulation ops: Reshape, Transpose, Unsqueeze, StridedSlice,
ShapeOf, Concat.

Reference semantics: op_plugins/{Reshape,Transpose,Unsqueeze,StridedSlice,
ShapeOf,Concat}.py.  Fixed per SURVEY.md §7: StridedSlice implements the
opset1 begin/end masks (bit=1 → the bound is ignored) with ordinary slicing
instead of building and ``eval``-ing a Python expression string
(StridedSlice.py:14-23), and supports shrink/new-axis masks.

In the compiled path these ops run on *logical* NCHW values; in the shipped
models they all sit on tiny shape tensors that constant folding (value
propagation in passes/shape_infer.py + runtime/compiler.py _find_folded_nodes)
removes from the runtime graph entirely, exactly the opportunity noted in
SURVEY.md §3.5.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir import attrs as A
from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def resolve_reshape_dims(
    in_shape: Tuple[int, ...], target: np.ndarray, special_zero: bool
) -> Tuple[int, ...]:
    """OpenVINO reshape semantics: 0 copies the input dim at the same (left-
    aligned) position when special_zero, a single -1 is inferred
    (reference: op_plugins/Reshape.py:14-44)."""
    total = 1
    for d in in_shape:
        total *= d
    dims: List[int] = []
    deferred = -1
    remaining = total
    for idx, d in enumerate(int(t) for t in target):
        if d == 0 and special_zero:
            d = in_shape[idx]
        if d == -1:
            if deferred != -1:
                raise ValueError("Reshape: multiple -1 dims in target")
            deferred = idx
            dims.append(-1)
            continue
        if d == 0 or remaining % d:
            # ValueError (not assert): callers catch it for fallbacks
            # (bake_batch → vmap batching), and -O must not erase it
            raise ValueError(
                f"Reshape: dim {d} does not divide {remaining} "
                f"(input {in_shape}, target "
                f"{tuple(int(t) for t in target)})")
        dims.append(d)
        remaining //= d
    if deferred != -1:
        dims[deferred] = remaining
    elif remaining != 1:
        raise ValueError(
            f"Reshape: target {tuple(int(t) for t in target)} covers "
            f"{total // remaining} of {total} elements of {in_shape}")
    return tuple(dims)


@register
class Reshape(Op):
    type_name = "Reshape"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        target = in_values.get(1)
        if target is None:
            raise ValueError(f"Reshape {node.name}: target shape is not constant")
        special_zero = A.get_bool(node.attrs, "special_zero", False)
        out = resolve_reshape_dims(in_shapes[0], target, special_zero)
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None:
            res.values[node.out_port] = in_values[0].reshape(out)
        return res

    def _dims(self, node, in_shape, target):
        special_zero = A.get_bool(node.attrs, "special_zero", False)
        return resolve_reshape_dims(tuple(in_shape), np.asarray(target), special_zero)

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        dims = self._dims(node, inputs[0].shape, inputs[1])
        return {node.out_port: inputs[0].reshape(dims)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        target = ctx.static_value(node, 1)
        x = inputs[0].nchw()
        dims = self._dims(node, x.shape, target)
        return {node.out_port: TValue(x.reshape(dims), "L")}


@register
class Transpose(Op):
    type_name = "Transpose"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axes = in_values.get(1)
        if axes is None:
            raise ValueError(f"Transpose {node.name}: axes are not constant")
        axes = tuple(int(a) for a in axes)
        out = tuple(in_shapes[0][a] for a in axes)
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None:
            res.values[node.out_port] = in_values[0].transpose(axes)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axes = tuple(int(a) for a in inputs[1])
        return {node.out_port: inputs[0].transpose(axes)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        axes = tuple(int(a) for a in ctx.static_value(node, 1))
        x = inputs[0].nchw()
        return {node.out_port: TValue(x.transpose(axes), "L")}


@register
class Unsqueeze(Op):
    type_name = "Unsqueeze"

    def _out_shape(self, in_shape, axes):
        out_rank = len(in_shape) + len(axes)
        axes = tuple(a % out_rank for a in axes)
        shape = []
        it = iter(in_shape)
        for i in range(out_rank):
            shape.append(1 if i in axes else next(it))
        return tuple(shape)

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axes = in_values.get(1)
        if axes is None:
            raise ValueError(f"Unsqueeze {node.name}: axes are not constant")
        out = self._out_shape(in_shapes[0], tuple(int(a) for a in axes))
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None:
            res.values[node.out_port] = in_values[0].reshape(out)
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        out = self._out_shape(inputs[0].shape, tuple(int(a) for a in inputs[1]))
        return {node.out_port: inputs[0].reshape(out)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        axes = tuple(int(a) for a in ctx.static_value(node, 1))
        x = inputs[0].nchw()
        return {node.out_port: TValue(x.reshape(self._out_shape(x.shape, axes)), "L")}


def _strided_slice_spec(node, in_rank, begin, end, strides):
    """Build a numpy-style index tuple honouring the opset1 masks —
    begin/end (bit=1 → bound ignored), new_axis (insert a unit dim,
    consumes no input axis), shrink_axis (integer-index the axis away),
    and ellipsis (exactly one bit: the skipped middle axes, numpy
    Ellipsis semantics).  The reference parses these masks and ignores
    them while eval()ing a slice string (reference:
    StridedSlice.py:14-23,38-44).
    """
    begin_mask = A.get_int_tuple(node.attrs, "begin_mask", ())
    end_mask = A.get_int_tuple(node.attrs, "end_mask", ())
    new_axis = A.get_int_tuple(node.attrs, "new_axis_mask", ())
    shrink = A.get_int_tuple(node.attrs, "shrink_axis_mask", ())
    ellipsis = A.get_int_tuple(node.attrs, "ellipsis_mask", ())

    def bit(mask, i):
        return mask[i] if i < len(mask) else 0

    if any(ellipsis):
        if sum(1 for i in range(len(begin)) if bit(ellipsis, i)) > 1:
            raise ValueError(
                "StridedSlice: at most one ellipsis_mask bit is allowed")
        spec = []
        for i in range(len(begin)):
            if bit(ellipsis, i):
                spec.append(Ellipsis)  # absorbs the skipped middle axes
            elif bit(new_axis, i):
                spec.append(None)
            elif bit(shrink, i):
                spec.append(int(begin[i]))
            else:
                b = None if bit(begin_mask, i) else int(begin[i])
                e = None if bit(end_mask, i) else int(end[i])
                s = (int(strides[i])
                     if strides is not None and i < len(strides) else 1)
                spec.append(slice(b, e, s))
        return spec

    spec = []
    in_axis = 0
    for i in range(len(begin)):
        if bit(new_axis, i):
            spec.append(None)  # np.newaxis — consumes no input axis
            continue
        if in_axis >= in_rank:
            break
        if bit(shrink, i):
            spec.append(int(begin[i]))  # drops the axis
        else:
            b = None if bit(begin_mask, i) else int(begin[i])
            e = None if bit(end_mask, i) else int(end[i])
            s = int(strides[i]) if strides is not None and i < len(strides) else 1
            spec.append(slice(b, e, s))
        in_axis += 1
    while in_axis < in_rank:
        spec.append(slice(None))
        in_axis += 1
    return spec


@register
class StridedSlice(Op):
    type_name = "StridedSlice"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        begin, end = in_values.get(1), in_values.get(2)
        strides = in_values.get(3)
        if begin is None or end is None:
            raise ValueError(f"StridedSlice {node.name}: bounds are not constant")
        slices = _strided_slice_spec(node, len(in_shapes[0]), begin, end, strides)
        dummy = np.empty(in_shapes[0], dtype=np.int8)
        out = dummy[tuple(slices)].shape
        res = ShapeResult({node.out_port: out})
        if in_values.get(0) is not None:
            res.values[node.out_port] = in_values[0][tuple(slices)]
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        slices = _strided_slice_spec(
            node, inputs[0].ndim, inputs[1], inputs[2], inputs.get(3)
        )
        return {node.out_port: inputs[0][tuple(slices)]}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        begin = ctx.static_value(node, 1)
        end = ctx.static_value(node, 2)
        strides = ctx.static_value(node, 3) if 3 in inputs else None
        x = inputs[0].nchw()
        slices = _strided_slice_spec(node, x.ndim, begin, end, strides)
        return {node.out_port: TValue(x[tuple(slices)], "L")}


@register
class ShapeOf(Op):
    type_name = "ShapeOf"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        shape = np.array(in_shapes[0], dtype=np.int64)
        return ShapeResult(
            {node.out_port: (len(in_shapes[0]),)}, {node.out_port: shape}
        )

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        dtype = node.outputs[node.out_port].dtype
        return {node.out_port: np.array(inputs[0].shape, dtype=dtype)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        dtype = node.outputs[node.out_port].dtype
        # shapes are static under jit → emit a literal constant
        return {
            node.out_port: TValue(jnp.array(inputs[0].shape, dtype=dtype), "L")
        }


@register
class Concat(Op):
    type_name = "Concat"
    # int8 carry when every input arrives stored at one common scale
    # (the compiler's demand propagation assigns concat branches the same
    # scale, so inception joins are pure int8 byte-shuffles); mixed
    # inputs are dequantized in emit.
    int8_ports = "all"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        axis = A.get_int(node.attrs, "axis")
        ports = sorted(in_shapes)
        base = list(in_shapes[ports[0]])
        axis = axis % len(base)
        base[axis] = sum(in_shapes[p][axis] for p in ports)
        res = ShapeResult({node.out_port: tuple(base)})
        if all(in_values.get(p) is not None for p in ports):
            res.values[node.out_port] = np.concatenate(
                [in_values[p] for p in ports], axis=axis
            )
        return res

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        axis = A.get_int(node.attrs, "axis")
        parts = [inputs[p] for p in sorted(inputs)]
        return {node.out_port: np.concatenate(parts, axis=axis)}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax.numpy as jnp

        axis = A.get_int(node.attrs, "axis")
        tvs = [inputs[p] for p in sorted(inputs)]
        scales = {t.act_scale for t in tvs}
        if len(scales) == 1 and None not in scales:
            carry = scales.pop()  # all int8 at one scale: concat stays int8
        else:
            carry = None
            tvs = [t.dequant(ctx.compute_dtype) for t in tvs]
        rank = len(tvs[0].shape)
        axis = axis % rank
        # channel concat stays channels-last (GoogLeNet inception joins)
        if rank == 4 and axis == 1 and all(t.layout == "CL" for t in tvs):
            out = jnp.concatenate([t.arr for t in tvs], axis=3)
            return {node.out_port: TValue(out, "CL", act_scale=carry)}
        out = jnp.concatenate([t.nchw() for t in tvs], axis=axis)
        return {node.out_port: TValue(out, "L", act_scale=carry)}
