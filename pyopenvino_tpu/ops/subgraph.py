"""Control-flow subgraph ops: TensorIterator (opset1), Loop (opset5),
If (opset8).

The reference engine has no subgraph support at all — a TensorIterator
layer (what its documented Model-Optimizer pipeline,
reference: convert-model.sh:1-12, emits for every TF/ONNX sequence model)
dies at reference: inference_engine.py:270-272.  Here a body is a nested
:class:`Model` (ir/subgraph.py) and each op has the usual two twins:

  * ``ref_compute`` — a plain Python loop driving the numpy Interpreter
    over the body once per iteration (the differential-testing twin);
  * ``emit`` — TPU-native structured control flow: TensorIterator is ONE
    ``lax.scan`` (body traced once, XLA compiles one loop program — no
    per-iteration dispatch), Loop is ``lax.while_loop`` with a static
    trip-count bound and pre-allocated concat buffers, If is ``lax.cond``.

TPU-first design notes:
  * iteration counts come from static shapes (sliced-input extents /
    constant trip counts) so every loop compiles to a fixed-shape XLA
    while op — no dynamic shapes anywhere;
  * body Const weights live in the SAME device weight pytree as outer
    weights under ``sub.<node>.<body>.<const>`` keys
    (runtime/compiler.py ``_build_weights``) so they are device-placed,
    shardable and donated like any other weight — never baked literals;
  * concatenated outputs are written by the scan itself (stacked then
    reshaped at the join axis), so the whole sequence output is one HBM
    buffer — the analogue of the hoisted-GEMM design in ops/recurrent.py.

Deliberate refusals (fail-fast, like every other op here):
  * ReadValue/Assign inside a body (per-iteration variable state has no
    defined opset semantics);
  * ``part_size`` not equal to |stride| (other than 1);
  * Loop with a dynamic trip count AND concatenated outputs (no static
    shape exists for the concat buffer).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


def _sub(node, key: str):
    if not node.subgraphs or key not in node.subgraphs:
        raise ValueError(
            f"{node.op_type} {node.name!r}: missing {key!r} subgraph "
            f"(IR <{key}> element)")
    return node.subgraphs[key]


def _analysis(sg):
    """Body shape analysis, cached on the SubGraph instance."""
    if not hasattr(sg, "_shape_analysis"):
        from pyopenvino_tpu.passes.shape_infer import infer_shapes

        _check_body(sg)
        sg._shape_analysis = infer_shapes(sg.model)
    return sg._shape_analysis


def _check_body(sg):
    for n in sg.model.nodes.values():
        if n.op_type in ("ReadValue", "Assign"):
            raise NotImplementedError(
                f"subgraph body contains {n.op_type} {n.name!r}: "
                f"per-iteration variable state inside a loop body has no "
                f"defined opset semantics — hoist the variable out of the "
                f"body")


def _float(dt) -> bool:
    return np.issubdtype(np.dtype(dt), np.floating)


def _result_shape(sg, rid: int) -> Tuple[int, ...]:
    return _analysis(sg).shape(*sg.result_source(rid))


def _entry_by_param(sg) -> Dict[int, object]:
    return {e.internal_layer_id: e for e in sg.inputs}


def _carried_params(sg) -> Dict[int, int]:
    """{body Parameter layer id: body Result layer id} per back edge."""
    return {to: frm for frm, to in sg.back_edges}


def _slice_shape(shape: Tuple[int, ...], axis: int, part: int):
    s = list(shape)
    if axis < 0:
        axis += len(s)
    if not 0 <= axis < len(s):
        raise ValueError(f"port_map axis {axis} out of range for {shape}")
    s[axis] = part
    return tuple(s), axis


def _validate_inputs(node, sg, in_shapes) -> int:
    """Cross-check every port-map input entry against the body Parameter
    shapes and derive the iteration count from sliced entries.
    Returns the iteration count (-1 when there are no sliced inputs)."""
    body = sg.model
    carried = _carried_params(sg)
    iters = -1
    for e in sg.inputs:
        if e.purpose == "current_iteration":
            continue
        if e.external_port_id not in in_shapes:
            raise ValueError(
                f"{node.op_type} {node.name!r}: port_map references input "
                f"port {e.external_port_id} but the node has no such edge")
        x_shape = in_shapes[e.external_port_id]
        p = body.nodes[e.internal_layer_id]
        p_shape = tuple(p.outputs[p.out_port].shape)
        if e.axis is not None:
            want, axis = _slice_shape(x_shape, e.axis, e.part_size)
            _, count, _ = e.iter_range(x_shape[axis])
            if count <= 0:
                raise ValueError(
                    f"{node.op_type} {node.name!r}: sliced input iterates "
                    f"{count} times")
            if iters not in (-1, count):
                raise ValueError(
                    f"{node.op_type} {node.name!r}: sliced inputs disagree "
                    f"on iteration count ({iters} vs {count})")
            iters = count
            if p_shape != want:
                raise ValueError(
                    f"{node.op_type} {node.name!r}: body Parameter "
                    f"{p.name!r} declares {p_shape}, sliced input provides "
                    f"{want}")
        elif p_shape != tuple(x_shape):
            # invariant or back-edge initial value: shapes must match exactly
            raise ValueError(
                f"{node.op_type} {node.name!r}: body Parameter {p.name!r} "
                f"declares {p_shape}, input port {e.external_port_id} "
                f"provides {tuple(x_shape)}")
        if e.axis is None and e.internal_layer_id in carried:
            # the back-edge source Result must produce the same shape it
            # consumes, or the carry diverges after one iteration
            r_shape = _result_shape(sg, carried[e.internal_layer_id])
            if r_shape != p_shape:
                raise ValueError(
                    f"{node.op_type} {node.name!r}: back edge carries "
                    f"{r_shape} into Parameter {p.name!r} of shape "
                    f"{p_shape}")
    return iters


def _output_shapes(node, sg, iters: int) -> Dict[int, Tuple[int, ...]]:
    out = {}
    for e in sg.outputs:
        if e.purpose == "execution_condition":
            continue
        per_iter = _result_shape(sg, e.internal_layer_id)
        if e.axis is None:
            out[e.external_port_id] = per_iter
        else:
            if iters < 0:
                raise ValueError(
                    f"{node.op_type} {node.name!r}: concatenated output "
                    f"needs a static iteration count")
            shape, axis = _slice_shape(per_iter, e.axis, e.part_size)
            if tuple(per_iter) != shape:
                raise ValueError(
                    f"{node.op_type} {node.name!r}: concat output expects "
                    f"the body to produce {e.part_size} elements at axis "
                    f"{axis}, body Result gives {per_iter}")
            full = list(per_iter)
            full[axis] = iters * e.part_size
            out[e.external_port_id] = tuple(full)
    if not out:
        raise ValueError(
            f"{node.op_type} {node.name!r}: port_map maps no outputs")
    return out


# -- numpy twin ----------------------------------------------------------------


def _np_cast(arr, info):
    return np.asarray(arr).reshape(info.shape).astype(info.dtype)


def _run_body_np(interp, sg, feeds_by_layer: Dict[int, np.ndarray]):
    body = sg.model
    feed = {body.nodes[lid].name: v for lid, v in feeds_by_layer.items()}
    res = interp.run(feed)
    return {r.id: res[r.name] for r in body.results}


def _np_slices(e, x):
    """Per-iteration chunks of x along e.axis, in iteration order."""
    first, count, step = e.iter_range(x.shape[e.axis])
    chunks = []
    for i in range(count):
        lo = first + i * step
        sl = [slice(None)] * x.ndim
        sl[e.axis] = slice(lo, lo + e.part_size)
        chunks.append(x[tuple(sl)])
    return chunks


def _np_concat(e, ys: List[np.ndarray]):
    if e.stride < 0:
        ys = ys[::-1]
    return np.concatenate(ys, axis=e.axis)


# -- JAX body emitter ----------------------------------------------------------


def _emit_graph(outer_ctx, node, bname: str, sg, param_vals: Dict[int, object]):
    """Trace the body once: {param layer id: array} → {result layer id:
    array} (logical layout).  A miniature of runtime/compiler.py
    ``_build_fn`` — no fusion/int8/state machinery (bodies refuse state),
    Const weights resolved from the shared device pytree under
    ``<prefix>sub.<node>.<bname>.<const>``."""
    import jax
    import jax.numpy as jnp

    from pyopenvino_tpu.ops import get_op
    from pyopenvino_tpu.passes.util import folded_nodes
    from pyopenvino_tpu.runtime.compiler import STATIC_PORTS, EmitCtx

    body = sg.model
    analysis = _analysis(sg)
    ctx = EmitCtx(body, analysis, outer_ctx.config)
    weights = getattr(outer_ctx, "weights", None) or {}
    prefix = getattr(outer_ctx, "weight_prefix", "") + f"sub.{node.id}.{bname}."
    ctx.weights = weights
    ctx.weight_prefix = prefix
    folded = folded_nodes(body, analysis)
    values: Dict[Tuple[int, int], TValue] = {}

    def tv_for(src: int, sport: int) -> TValue:
        key = (src, sport)
        if key in values:
            return values[key]
        sn = body.nodes[src]
        if sn.op_type == "Const":
            w = weights.get(prefix + str(src))
            if w is None:
                if sn.const is None:
                    raise RuntimeError(
                        f"body Const {sn.name!r} has no weights")
                w = jnp.asarray(
                    sn.const,
                    dtype=(ctx.compute_dtype
                           if _float(sn.const.dtype) else None))
            values[key] = TValue(w, "L")
            return values[key]
        val = analysis.value(src, sport)
        if val is None:
            raise RuntimeError(
                f"body: no traced or static value for layer {src} "
                f"port {sport}")
        values[key] = TValue(jnp.asarray(val), "L")
        return values[key]

    results: Dict[int, object] = {}
    for bn in body:
        if bn.op_type == "Parameter":
            info = bn.outputs[bn.out_port]
            x = jnp.asarray(param_vals[bn.id]).reshape(info.shape)
            x = x.astype(
                ctx.compute_dtype if _float(info.dtype) else info.dtype)
            values[(bn.id, bn.out_port)] = TValue(x, "L")
        elif bn.op_type == "Const":
            continue  # pulled lazily by tv_for (may feed only STATIC_PORTS)
        elif bn.op_type == "Result":
            src, sport = body.in_edges[bn.id][0]
            out = tv_for(src, sport).nchw()
            decl = bn.inputs[0].dtype
            results[bn.id] = out.astype(
                ctx.compute_dtype if _float(decl) else decl)
        elif bn.id in folded:
            continue
        else:
            op = get_op(bn.op_type)
            ins = {}
            for port, (src, sport) in sorted(body.in_edges[bn.id].items()):
                if (bn.op_type, port) in STATIC_PORTS:
                    continue
                ins[port] = tv_for(src, sport)
            with jax.named_scope(f"{bname}.{bn.op_type}_{bn.id}"):
                outs = op.emit(ctx, bn, ins)
            for port, tv in outs.items():
                values[(bn.id, port)] = tv
    return results


def body_const_weights(node, compute_dtype, prefix: str = "") -> Dict[str, object]:
    """Weight-pytree entries for every Const in every body of ``node``
    (recursing into nested subgraph ops) — called by the compiler's
    ``_build_weights`` so body weights are device-resident parameters,
    never baked literals."""
    import jax.numpy as jnp

    from pyopenvino_tpu.passes.util import folded_nodes

    out: Dict[str, object] = {}
    for bname, sg in (node.subgraphs or {}).items():
        from pyopenvino_tpu.runtime.compiler import STATIC_PORTS

        p = f"{prefix}sub.{node.id}.{bname}."
        body = sg.model
        folded = folded_nodes(body, _analysis(sg))
        for bn in body.nodes.values():
            if bn.op_type == "Const":
                # only consts with a traced consumer (mirror the outer
                # compiler's _find_runtime_consts): shape targets and
                # folded-subgraph feeds never reach the device
                traced = any(
                    dst not in folded
                    and (body.nodes[dst].op_type, dport) not in STATIC_PORTS
                    for _, dst, dport in body.out_edges[bn.id]
                )
                if not traced:
                    continue
                if bn.const is None:
                    raise RuntimeError(
                        f"body Const {bn.name!r} has no weights")
                out[p + str(bn.id)] = jnp.asarray(
                    bn.const,
                    dtype=(compute_dtype if _float(bn.const.dtype)
                           else None))
            elif bn.subgraphs:
                out.update(body_const_weights(bn, compute_dtype, p))
    return out


def _pvary(tree):
    """Align initial scan/while carries' varying-manual-axes with the body
    outputs when tracing inside shard_map (pipeline stages run under
    shard_map — parallel/pipeline.py): a Const-derived init is unvarying
    over the manual mesh axes while the body's per-iteration result is
    varying, and lax.scan/while_loop require equal carry types.  No-op
    outside shard_map."""
    import jax

    try:
        from jax._src.core import get_axis_env
    except ImportError:  # private API moved — fall back to plain carries
        return tree
    names = tuple(get_axis_env().axis_sizes)
    if not names:
        return tree

    def align(x):
        have = getattr(getattr(x, "aval", None), "vma", frozenset())
        missing = tuple(n for n in names if n not in have)
        if not missing:
            return x
        return jax.lax.pcast(x, missing, to="varying")

    return jax.tree.map(align, tree)


def _chunked(e, x, axis: int):
    """(iters, per-iteration-slice) view of a traced input, iteration-major
    — the scan's xs."""
    import jax.numpy as jnp

    first, count, step = e.iter_range(x.shape[axis])
    xm = jnp.moveaxis(x, axis, 0)
    lo = min(first, first + (count - 1) * step)
    region = xm[lo:lo + count * e.part_size]
    chunks = region.reshape((count, e.part_size) + xm.shape[1:])
    if step < 0:
        chunks = chunks[::-1]
    # restore the part axis to its body position: per-iter item shape must
    # equal the body Parameter shape
    return jnp.moveaxis(chunks, 1, axis + 1)


def _merge_concat(e, y, axis: int):
    """Stacked per-iteration results (iters leading) → one tensor joined
    at ``axis`` in port-map order."""
    import jax.numpy as jnp

    if e.stride < 0:
        y = y[::-1]
    y = jnp.moveaxis(y, 0, axis)          # (..., iters, part, ...)
    shape = list(y.shape)
    merged = shape[:axis] + [shape[axis] * shape[axis + 1]] + shape[axis + 2:]
    return y.reshape(merged)


@register
class TensorIterator(Op):
    """opset1 TensorIterator → ONE ``lax.scan``.

    Sliced inputs become the scan's xs (chunked iteration-major, reversed
    for negative stride); back edges are the scan carry; concatenated
    outputs are the stacked ys merged at the join axis; last-value outputs
    take the final iteration's stacked slot.
    """

    type_name = "TensorIterator"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        sg = _sub(node, "body")
        _analysis(sg)  # validates body + refuses state ops
        iters = _validate_inputs(node, sg, in_shapes)
        if iters < 0:
            raise ValueError(
                f"TensorIterator {node.name!r}: no sliced input — the "
                f"iteration count is underivable (use Loop with a trip "
                f"count instead)")
        for e in sg.inputs + sg.outputs:
            if e.purpose:
                raise ValueError(
                    f"TensorIterator {node.name!r}: purpose="
                    f"{e.purpose!r} entries are Loop-only")
        return ShapeResult(_output_shapes(node, sg, iters))

    # -- shared classification -------------------------------------------

    @staticmethod
    def _classify(sg, inputs_by_port):
        """(sliced entries, invariant {pid: x}, initial {pid: x})."""
        carried = _carried_params(sg)
        sliced, invariant, init = [], {}, {}
        for e in sg.inputs:
            if e.purpose:  # current_iteration is fed by the loop itself
                continue
            x = inputs_by_port[e.external_port_id]
            if e.axis is not None:
                sliced.append((e, x))
            elif e.internal_layer_id in carried:
                init[e.internal_layer_id] = x
            else:
                invariant[e.internal_layer_id] = x
        missing = set(carried) - set(init)
        if missing:
            names = [sg.model.nodes[p].name for p in sorted(missing)]
            raise ValueError(
                f"back-edge Parameters with no initial-value port-map "
                f"entry: {names}")
        return sliced, invariant, init

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        sg = _sub(node, "body")
        body = sg.model
        sliced, invariant, carry = self._classify(sg, inputs)
        iters = _validate_inputs(
            node, sg, {p: np.asarray(v).shape for p, v in inputs.items()})
        chunk_lists = {e.internal_layer_id: _np_slices(e, np.asarray(x))
                       for e, x in sliced}
        carry = {
            pid: _np_cast(v, body.nodes[pid].outputs[body.nodes[pid].out_port])
            for pid, v in carry.items()
        }
        interp = Interpreter(body)
        collected: Dict[int, List[np.ndarray]] = {
            e.internal_layer_id: [] for e in sg.outputs
        }
        back = sg.back_edges
        for it in range(iters):
            feed = dict(invariant)
            feed.update(carry)
            feed.update(
                {pid: chunks[it] for pid, chunks in chunk_lists.items()})
            res = _run_body_np(interp, sg, feed)
            carry = {to: res[frm] for frm, to in back}
            for rid in collected:
                collected[rid].append(res[rid])
        out = {}
        for e in sg.outputs:
            ys = collected[e.internal_layer_id]
            if e.axis is None:
                out[e.external_port_id] = ys[-1]
            else:
                out[e.external_port_id] = _np_concat(e, ys)
        return out

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        sg = _sub(node, "body")
        body = sg.model
        logical = {p: tv.nchw() for p, tv in inputs.items()}
        sliced, invariant, init = self._classify(sg, logical)
        xs = {}
        for e, x in sliced:
            _, axis = _slice_shape(x.shape, e.axis, e.part_size)
            xs[e.internal_layer_id] = _chunked(e, x, axis)
        carry_ids = [to for _, to in sg.back_edges]

        def cast_init(pid, v):
            info = body.nodes[pid].outputs[body.nodes[pid].out_port]
            return jnp.asarray(v).reshape(info.shape).astype(
                ctx.compute_dtype if _float(info.dtype) else info.dtype)

        carry0 = _pvary(tuple(cast_init(pid, init[pid])
                              for pid in carry_ids))
        back_frm = [frm for frm, _ in sg.back_edges]
        # last-value outputs ride the carry, not the stacked ys — stacking
        # a (T, ...) buffer only to read slot T-1 wastes (T-1)x HBM (the
        # common Keras return_sequences=False conversion).  Back-edge
        # sources are already carried; other last-value results join the
        # carry tail.
        stacked_ids = [e.internal_layer_id for e in sg.outputs
                       if e.axis is not None]
        extra_last = [e.internal_layer_id for e in sg.outputs
                      if e.axis is None
                      and e.internal_layer_id not in back_frm]
        extra0 = _pvary(tuple(
            jnp.zeros(_result_shape(sg, rid),
                      (ctx.compute_dtype
                       if _float(body.nodes[rid].inputs[0].dtype)
                       else body.nodes[rid].inputs[0].dtype))
            for rid in extra_last))

        def body_fn(carry, xt):
            state, _ = carry
            pv = dict(invariant)
            pv.update(zip(carry_ids, state))
            pv.update(xt)
            res = _emit_graph(ctx, node, "body", sg, pv)
            new_state = tuple(res[frm] for frm in back_frm)
            new_extra = tuple(res[rid] for rid in extra_last)
            return (new_state, new_extra), tuple(
                res[rid] for rid in stacked_ids)

        (final_state, final_extra), ys = jax.lax.scan(
            body_fn, (carry0, extra0), xs)
        last_by_id = dict(zip(back_frm, final_state))
        last_by_id.update(zip(extra_last, final_extra))
        ys_by_id = dict(zip(stacked_ids, ys))
        out = {}
        for e in sg.outputs:
            if e.axis is None:
                out[e.external_port_id] = TValue(
                    last_by_id[e.internal_layer_id], "L")
            else:
                y = ys_by_id[e.internal_layer_id]
                _, axis = _slice_shape(
                    tuple(y.shape[1:]), e.axis, e.part_size)
                out[e.external_port_id] = TValue(
                    _merge_concat(e, y, axis), "L")
        return out


@register
class Loop(Op):
    """opset5 Loop → ``lax.while_loop`` with a static trip-count bound.

    Input 0 = trip count, input 1 = initial execution condition; the body
    may take a ``current_iteration`` Parameter and must yield an
    ``execution_condition`` Result (purpose attributes in the port map).
    With concatenated outputs the trip count must be a compile-time
    constant: the concat buffer is pre-allocated at [trip_count, ...] and
    written per-iteration (unexecuted tail slots stay zero — the OpenVINO
    runtime leaves them undefined; zeros is the fail-safe realization).
    A dynamic trip count (or -1 = run-until-condition) is supported for
    last-value-only Loops.
    """

    type_name = "Loop"

    @staticmethod
    def _special(sg):
        cur = [e for e in sg.inputs if e.purpose == "current_iteration"]
        cond = [e for e in sg.outputs if e.purpose == "execution_condition"]
        if len(cond) != 1:
            raise ValueError(
                "Loop body must declare exactly one execution_condition "
                "output")
        if len(cur) > 1:
            raise ValueError(
                "Loop body declares multiple current_iteration inputs")
        return (cur[0].internal_layer_id if cur else None,
                cond[0].internal_layer_id)

    @staticmethod
    def _trip_count(node, in_values):
        tc = in_values.get(0)
        if tc is None:
            return None
        return int(np.asarray(tc).reshape(()))

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        sg = _sub(node, "body")
        _analysis(sg)
        self._special(sg)
        data_shapes = {p: s for p, s in in_shapes.items() if p >= 2}
        iters = _validate_inputs(node, sg, data_shapes)
        tc = self._trip_count(node, in_values)
        if iters >= 0:
            if tc is None:
                raise ValueError(
                    f"Loop {node.name!r}: sliced inputs need a "
                    f"compile-time-constant trip count")
            if tc != iters:
                raise ValueError(
                    f"Loop {node.name!r}: trip count {tc} != sliced-input "
                    f"iteration count {iters}")
        n = iters if iters >= 0 else (tc if tc is not None and tc >= 0 else -1)
        return ShapeResult(_output_shapes(node, sg, n))

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        sg = _sub(node, "body")
        body = sg.model
        cur_id, cond_id = self._special(sg)
        tc = int(np.asarray(inputs[0]).reshape(()))
        cond = bool(np.asarray(inputs[1]).reshape(()))
        data = {p: v for p, v in inputs.items() if p >= 2}
        sliced, invariant, carry = TensorIterator._classify(sg, data)
        chunk_lists = {e.internal_layer_id: _np_slices(e, np.asarray(x))
                       for e, x in sliced}
        carry = {
            pid: _np_cast(v, body.nodes[pid].outputs[body.nodes[pid].out_port])
            for pid, v in carry.items()
        }
        interp = Interpreter(body)
        collected: Dict[int, List[np.ndarray]] = {
            e.internal_layer_id: [] for e in sg.outputs
        }
        it = 0
        limit = tc if tc >= 0 else (1 << 62)
        while it < limit and cond:
            feed = dict(invariant)
            feed.update(carry)
            feed.update(
                {pid: chunks[it] for pid, chunks in chunk_lists.items()})
            if cur_id is not None:
                info = body.nodes[cur_id].outputs[
                    body.nodes[cur_id].out_port]
                feed[cur_id] = np.full(info.shape or (), it, info.dtype)
            res = _run_body_np(interp, sg, feed)
            cond = bool(np.asarray(res[cond_id]).reshape(()))
            carry = {to: res[frm] for frm, to in sg.back_edges}
            for rid in collected:
                collected[rid].append(res[rid])
            it += 1
        out = {}
        for e in sg.outputs:
            if e.purpose == "execution_condition":
                continue
            ys = collected[e.internal_layer_id]
            per_iter = _result_shape(sg, e.internal_layer_id)
            decl_dtype = body.nodes[e.internal_layer_id].inputs[0].dtype
            if e.axis is None:
                out[e.external_port_id] = (
                    ys[-1] if ys else np.zeros(per_iter, decl_dtype))
            else:
                # pad to the declared static extent (trip count) with zeros
                full, axis = _slice_shape(per_iter, e.axis, e.part_size)
                buf = np.zeros(
                    full[:axis] + (tc * e.part_size,) + full[axis + 1:],
                    decl_dtype)
                if ys:
                    cat = _np_concat(e, ys)
                    sl = [slice(None)] * buf.ndim
                    if e.stride < 0:
                        sl[axis] = slice(buf.shape[axis] - cat.shape[axis],
                                         None)
                    else:
                        sl[axis] = slice(0, cat.shape[axis])
                    buf[tuple(sl)] = cat
                out[e.external_port_id] = buf
        return out

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        sg = _sub(node, "body")
        body = sg.model
        cur_id, cond_id = self._special(sg)
        src0 = ctx.model.in_edges[node.id][0]
        tc_static = ctx.analysis.value(*src0)
        tc_static = (int(np.asarray(tc_static).reshape(()))
                     if tc_static is not None else None)
        data = {p: tv.nchw() for p, tv in inputs.items() if p >= 2}
        sliced, invariant, init = TensorIterator._classify(sg, data)
        concat_entries = [e for e in sg.outputs
                          if e.axis is not None and not e.purpose]
        if tc_static is None and (sliced or concat_entries):
            raise ValueError(
                f"Loop {node.name!r}: dynamic trip count with sliced "
                f"inputs or concatenated outputs has no static shape")

        xs = {}
        for e, x in sliced:
            _, axis = _slice_shape(x.shape, e.axis, e.part_size)
            xs[e.internal_layer_id] = _chunked(e, x, axis)
        carry_ids = [to for _, to in sg.back_edges]

        def cast_init(pid, v):
            info = body.nodes[pid].outputs[body.nodes[pid].out_port]
            return jnp.asarray(v).reshape(info.shape).astype(
                ctx.compute_dtype if _float(info.dtype) else info.dtype)

        carry0 = tuple(cast_init(pid, init[pid]) for pid in carry_ids)
        out_entries = [e for e in sg.outputs if not e.purpose]
        out_ids = [e.internal_layer_id for e in out_entries]

        def slot0(e):
            per = _result_shape(sg, e.internal_layer_id)
            decl = body.nodes[e.internal_layer_id].inputs[0].dtype
            dt = ctx.compute_dtype if _float(decl) else decl
            if e.axis is None:
                return jnp.zeros(per, dt)
            return jnp.zeros((tc_static,) + tuple(per), dt)

        slots0 = tuple(slot0(e) for e in out_entries)
        if tc_static is not None:
            limit = jnp.asarray(
                tc_static if tc_static >= 0 else np.iinfo(np.int32).max,
                jnp.int32)
        else:
            tc = inputs[0].nchw().reshape(()).astype(jnp.int32)
            limit = jnp.where(tc < 0, np.iinfo(np.int32).max, tc)
        cond0 = inputs[1].nchw().reshape(()).astype(bool)

        def cond_fn(st):
            i, cond, _, _ = st
            return jnp.logical_and(i < limit, cond)

        def body_fn(st):
            i, _, carry, slots = st
            pv = dict(invariant)
            pv.update(zip(carry_ids, carry))
            for pid, chunks in xs.items():
                pv[pid] = jax.lax.dynamic_index_in_dim(
                    chunks, i, axis=0, keepdims=False)
            if cur_id is not None:
                info = body.nodes[cur_id].outputs[body.nodes[cur_id].out_port]
                pv[cur_id] = jnp.full(info.shape or (), i, info.dtype)
            res = _emit_graph(ctx, node, "body", sg, pv)
            new_carry = tuple(res[frm] for frm, _ in sg.back_edges)
            new_slots = []
            for e, slot in zip(out_entries, slots):
                y = res[e.internal_layer_id]
                if e.axis is None:
                    new_slots.append(y)
                else:
                    new_slots.append(jax.lax.dynamic_update_index_in_dim(
                        slot, y[None], i, axis=0))
            cond2 = res[cond_id].reshape(()).astype(bool)
            return (i + 1, cond2, new_carry, tuple(new_slots))

        _, _, _, slots = jax.lax.while_loop(
            cond_fn, body_fn,
            _pvary((jnp.asarray(0, jnp.int32), cond0, carry0, slots0)))
        out = {}
        for e, y in zip(out_entries, slots):
            if e.axis is None:
                out[e.external_port_id] = TValue(y, "L")
            else:
                _, axis = _slice_shape(
                    tuple(y.shape[1:]), e.axis, e.part_size)
                out[e.external_port_id] = TValue(
                    _merge_concat(e, y, axis), "L")
        return out


@register
class If(Op):
    """opset8 If → ``lax.cond``: both bodies traced once, XLA executes
    one.  Then/else port maps bind the node's data inputs (ports >= 1) to
    each body's Parameters; both bodies must produce identical output
    shapes/dtypes (validated at shape inference)."""

    type_name = "If"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        shapes, dtypes = {}, {}
        for bname in ("then_body", "else_body"):
            sg = _sub(node, bname)
            _analysis(sg)
            if sg.back_edges:
                raise ValueError(
                    f"If {node.name!r}: {bname} has back edges")
            for e in sg.inputs + sg.outputs:
                if e.axis is not None or e.purpose:
                    raise ValueError(
                        f"If {node.name!r}: {bname} port map entries must "
                        f"be plain (no axis/purpose)")
            data = {p: s for p, s in in_shapes.items() if p >= 1}
            _validate_inputs(node, sg, data)
            got = _output_shapes(node, sg, -1)
            got_dt = {
                e.external_port_id:
                sg.model.nodes[e.internal_layer_id].inputs[0].dtype
                for e in sg.outputs
            }
            if not shapes:
                shapes, dtypes = got, got_dt
            elif got != shapes:
                raise ValueError(
                    f"If {node.name!r}: then/else output shapes disagree "
                    f"({shapes} vs {got})")
            elif got_dt != dtypes:
                raise ValueError(
                    f"If {node.name!r}: then/else output dtypes disagree "
                    f"({dtypes} vs {got_dt})")
        if tuple(in_shapes.get(0, ())) not in ((), (1,)):
            raise ValueError(
                f"If {node.name!r}: condition must be a scalar boolean, "
                f"got shape {in_shapes[0]}")
        return ShapeResult(shapes)

    @staticmethod
    def _feeds(sg, data):
        return {e.internal_layer_id: data[e.external_port_id]
                for e in sg.inputs}

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        from pyopenvino_tpu.runtime.interpreter import Interpreter

        pred = bool(np.asarray(inputs[0]).reshape(()))
        sg = _sub(node, "then_body" if pred else "else_body")
        body = sg.model
        data = {p: v for p, v in inputs.items() if p >= 1}
        feeds = {
            pid: _np_cast(v, body.nodes[pid].outputs[body.nodes[pid].out_port])
            for pid, v in self._feeds(sg, data).items()
        }
        res = _run_body_np(Interpreter(body), sg, feeds)
        return {e.external_port_id: res[e.internal_layer_id]
                for e in sg.outputs}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        import jax
        import jax.numpy as jnp

        pred = inputs[0].nchw().reshape(()).astype(bool)
        data = {p: tv.nchw() for p, tv in inputs.items() if p >= 1}
        then_sg = _sub(node, "then_body")
        else_sg = _sub(node, "else_body")
        ext_ports = sorted(e.external_port_id for e in then_sg.outputs)
        if ext_ports != sorted(e.external_port_id for e in else_sg.outputs):
            raise ValueError(
                f"If {node.name!r}: then/else map different output ports")

        def branch(bname, sg):
            def fn(_):
                res = _emit_graph(ctx, node, bname, sg,
                                  self._feeds(sg, data))
                by_port = {e.external_port_id: res[e.internal_layer_id]
                           for e in sg.outputs}
                return tuple(by_port[p] for p in ext_ports)
            return fn

        outs = jax.lax.cond(
            pred, branch("then_body", then_sg), branch("else_body", else_sg),
            jnp.zeros(()))
        return {p: TValue(y, "L") for p, y in zip(ext_ports, outs)}
