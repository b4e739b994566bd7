"""Stateful-inference ops: ReadValue / Assign (OpenVINO opset6 variables).

The reference has no stateful support at all (pyopenvino/op_plugins/ has no
ReadValue/Assign plugin; a stateful IR dies at inference_engine.py:270-272).
Real OpenVINO models use variable state for streaming workloads — speech
models, low-latency LSTM transforms — via ReadValue (read a named variable,
falling back to an init subgraph before the first Assign) and Assign (write
the variable at the end of the inference), surfaced through
``InferRequest.query_state()`` / ``VariableState`` [OpenVINO 2.0 runtime API].

TPU-native design: variables are NOT mutable device globals (XLA programs are
pure).  The compiled step is a *functional* state transformer

    fn(weights, inputs, state) -> (outputs, new_state)

with ``state = {variable_id: array}`` carried as a jit argument pytree and
donated (``donate_argnums``) so XLA aliases the output state onto the input
buffers — the update is in-place on device, zero per-step allocation, which
is exactly the KV-cache/streaming pattern TPU serving stacks use.  Reads of
un-assigned variables pass through (output state aliases input state), and
Assign writes become visible on the NEXT inference, matching OpenVINO's
variable semantics.

Like Parameter/Const/Result (ops/io_ops.py), these two ops are executed by
the executors themselves — the interpreter keeps a persistent ``state`` dict
across run() calls (runtime/interpreter.py), the compiler threads the state
pytree (runtime/compiler.py _build_fn) — so ref_compute/emit here are
fail-fast stubs; only shape inference is real logic.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ops.spec import Op, ShapeResult, register


def variable_id(node) -> str:
    vid = node.attrs.get("variable_id", "")
    if not vid:
        raise ValueError(
            f"{node.op_type} node {node.name!r} has no variable_id attribute"
        )
    return vid


@register
class ReadValue(Op):
    """Read variable ``variable_id``; before the first Assign (or after a
    state reset) the value is the init subgraph on input port 0."""

    type_name = "ReadValue"

    def ref_compute(self, node, inputs):
        raise RuntimeError(
            "ReadValue is executed by the executor's state machinery "
            "(runtime/interpreter.py, runtime/compiler.py), not dispatched"
        )

    def emit(self, ctx, node, inputs):
        raise RuntimeError(
            "ReadValue is threaded through the compiled state pytree "
            "(runtime/compiler.py _build_fn), not dispatched"
        )

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        if 0 in in_shapes:
            # deliberately no value propagation even when the init input is
            # a folded constant: the runtime value is the VARIABLE, which
            # only coincides with the init before the first Assign
            return ShapeResult({node.out_port: tuple(in_shapes[0])})
        # opset6 allows an init-less ReadValue: shape comes from the
        # declared output port (zero-initialized at reset)
        info = node.outputs.get(node.out_port)
        if info is None or info.shape == ():
            raise ValueError(
                f"ReadValue {node.name!r}: no init input and no declared "
                "output shape to size the variable from"
            )
        return ShapeResult({node.out_port: tuple(info.shape)})


@register
class Assign(Op):
    """Write input port 0 into variable ``variable_id``; visible to
    ReadValue on the NEXT inference.  A graph sink, like Result."""

    type_name = "Assign"

    def ref_compute(self, node, inputs):
        raise RuntimeError(
            "Assign is executed by the executor's state machinery "
            "(runtime/interpreter.py, runtime/compiler.py), not dispatched"
        )

    def emit(self, ctx, node, inputs):
        raise RuntimeError(
            "Assign is threaded through the compiled state pytree "
            "(runtime/compiler.py _build_fn), not dispatched"
        )

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({})


def model_variables(model, analysis=None) -> Dict[str, dict]:
    """{variable_id: {"shape", "dtype", "init", "read", "assign"}} for every
    variable in the model — the single definition both executors and the
    API's VariableState build from.

    ``init`` is the statically-known init value (None → zeros at reset);
    ``read``/``assign`` are node ids (assign may be None for a read-only
    variable, whose state then passes through unchanged).

    ``dynamic_init`` marks a ReadValue whose init edge exists but is NOT
    statically foldable (an input-dependent init subgraph — legal OpenVINO
    IR).  The interpreter initializes such a variable from the runtime
    init value on the first run; the compiled path matches by carrying a
    per-variable ``fresh`` flag in the state pytree and selecting
    ``where(fresh, traced_init, state)`` (runtime/compiler.py _build_fn),
    so the two executors agree on first-infer semantics.
    """
    variables: Dict[str, dict] = {}
    for node in model.find_by_type("ReadValue"):
        vid = variable_id(node)
        if vid in variables:
            raise ValueError(f"duplicate ReadValue for variable {vid!r}")
        info = node.outputs[node.out_port]
        init = None
        dynamic = False
        if analysis is not None and 0 in model.in_edges[node.id]:
            src, sport = model.in_edges[node.id][0]
            init = analysis.value(src, sport)
            dynamic = init is None
        variables[vid] = {
            "shape": tuple(info.shape),
            "dtype": np.dtype(info.dtype),
            "init": None if init is None else np.asarray(init),
            "dynamic_init": dynamic,
            "read": node.id,
            "assign": None,
        }
    for node in model.find_by_type("Assign"):
        vid = variable_id(node)
        if vid not in variables:
            raise ValueError(
                f"Assign {node.name!r} writes variable {vid!r} with no "
                "matching ReadValue"
            )
        if variables[vid]["assign"] is not None:
            raise ValueError(f"duplicate Assign for variable {vid!r}")
        variables[vid]["assign"] = node.id
    # Batch-baked stateful graphs (IENetwork.reshape with the batch folded
    # into the Parameter shapes): the ReadValue's init subgraph keeps its
    # original (unbatched) shape while the Assign writes the batched
    # tensor.  The variable's steady state IS the assigned shape — N
    # streams in lockstep, each starting from the broadcast init — so
    # adopt it when the read shape broadcasts up to it, and fail fast on a
    # genuine mismatch.
    for vid, v in variables.items():
        if v["assign"] is None:
            continue
        info = model.nodes[v["assign"]].inputs.get(0)
        ashape = tuple(info.shape) if info is not None else ()
        if not ashape or ashape == v["shape"]:
            continue
        try:
            bshape = tuple(np.broadcast_shapes(v["shape"], ashape))
        except ValueError:
            bshape = None
        if bshape != ashape:
            raise ValueError(
                f"variable {vid!r}: Assign shape {ashape} is not a "
                f"broadcast of the ReadValue shape {v['shape']}"
            )
        v["shape"] = ashape
    return variables


def initial_state(variables: Dict[str, dict]) -> Dict[str, np.ndarray]:
    """Fresh {variable_id: array} — init subgraph value where statically
    known, zeros otherwise (OpenVINO resets to the init subgraph; an
    init-less opset6 variable resets to zeros).  ``dynamic_init``
    variables get a zeros placeholder here; the executors compute the
    real init at the first inference (interpreter: runtime init input;
    compiled: the ``fresh``-flag select in _build_fn)."""
    state = {}
    for vid, v in variables.items():
        if v["init"] is not None:
            init = np.asarray(v["init"], dtype=v["dtype"])
            if init.size == np.prod(v["shape"], dtype=int):
                state[vid] = init.reshape(v["shape"])
            else:  # batch-baked variable: init broadcasts across the batch
                state[vid] = np.ascontiguousarray(
                    np.broadcast_to(init, v["shape"])
                )
        else:
            state[vid] = np.zeros(v["shape"], dtype=v["dtype"])
    return state
