"""Numpy interpreter backend — the differential-testing twin of the compiled
path.

Mirrors the reference's layer-at-a-time executor (reference:
inference_engine.py:245-321): walks the topological order, gathers each
node's predecessor outputs per edge, dispatches to the op's numpy
``ref_compute`` and stores results per (node, port).  Keeps the reference's
debugging affordances:

  * verbose per-node wall-clock timing (inference_engine.py:273-283)
  * ``expected_result`` golden feature-map comparison per node name
    (inference_engine.py:214,284-287)
  * ``capture_node_args`` — the pickle_node_args single-op fixture hook
    (inference_engine.py:216,275-278), returning (node, inputs) pairs.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from pyopenvino_tpu.ir.model import Model
from pyopenvino_tpu.ops import get_op


class Interpreter:
    def __init__(self, model: Model):
        self.model = model
        # persistent {variable_id: ndarray} across run() calls — the numpy
        # twin of the compiled path's functional state pytree
        # (runtime/compiler.py; ops/state_ops.py module docstring)
        self.state: Dict[str, np.ndarray] = {}
        # {node_name: ndarray} golden comparison, like the reference's
        # expected_result {name: (prec, dims, ndarray)} hook
        self.expected_result: Optional[Dict[str, np.ndarray]] = None
        self.expected_rtol: float = 1.0
        # node ids whose (node, inputs) should be captured for op-level tests
        self.capture_node_args: List[int] = []
        self.captured: List[Tuple[object, dict]] = []
        self.last_timings: List[Tuple[int, str, str, float]] = []

    def run(
        self, inputs: Dict[str, np.ndarray], verbose: bool = False,
        observe=None,
    ) -> Dict[str, np.ndarray]:
        """Run the numpy twin.  ``observe(node, node_inputs, outs)`` is
        called after every traced op — the per-node hook that serves
        activation calibration (passes/calibrate.py) and any future
        walker, so the Parameter/Const/Result/ref_compute loop lives in
        exactly one place."""
        model = self.model
        params = {}
        for node in model.parameters:
            if node.name not in inputs:
                raise KeyError(f"missing input for Parameter {node.name!r}")
            info = node.outputs[node.out_port]
            params[node.id] = (
                np.asarray(inputs[node.name]).reshape(info.shape).astype(info.dtype)
            )

        store: Dict[Tuple[int, int], np.ndarray] = {}
        results: Dict[str, np.ndarray] = {}
        pending_state: Dict[str, np.ndarray] = {}
        self.last_timings = []
        compare_failures = []

        for node in model:
            node_inputs = {
                port: store[(src, sport)]
                for port, (src, sport) in sorted(model.in_edges[node.id].items())
            }
            t0 = time.perf_counter()
            if node.op_type == "Parameter":
                outs = {node.out_port: params[node.id]}
            elif node.op_type == "Const":
                if node.const is None:
                    raise RuntimeError(f"Const {node.name!r}: weights not loaded")
                outs = {node.out_port: node.const}
            elif node.op_type == "Result":
                results[node.name] = node_inputs[0]
                outs = {}
            elif node.op_type == "ReadValue":
                from pyopenvino_tpu.ops.state_ops import variable_id

                vid = variable_id(node)
                if vid not in self.state:
                    info = node.outputs[node.out_port]
                    init = (
                        node_inputs[0].astype(info.dtype)
                        if 0 in node_inputs
                        else np.zeros(info.shape, dtype=info.dtype)
                    )
                    self.state[vid] = init.reshape(info.shape)
                outs = {node.out_port: self.state[vid]}
            elif node.op_type == "Assign":
                from pyopenvino_tpu.ops.state_ops import variable_id

                # staged, committed after the walk: Assign is visible to
                # ReadValue on the NEXT inference (OpenVINO variable
                # semantics; ops/state_ops.py)
                pending_state[variable_id(node)] = node_inputs[0]
                outs = {}
            else:
                if node.id in self.capture_node_args:
                    self.captured.append((node, dict(node_inputs)))
                outs = get_op(node.op_type).ref_compute(node, node_inputs)
                if observe is not None:
                    observe(node, node_inputs, outs)
            dt = time.perf_counter() - t0
            self.last_timings.append((node.id, node.op_type, node.name, dt))
            if verbose:
                print(f"{node.id} {node.op_type} {node.name} {dt:.6f}")

            for port, arr in outs.items():
                store[(node.id, port)] = arr
                if self.expected_result and node.name in self.expected_result:
                    from pyopenvino_tpu.utils.compare import compare_golden

                    ok = compare_golden(
                        node.name, arr, self.expected_result[node.name],
                        rtol=self.expected_rtol, verbose=verbose,
                    )
                    if not ok:
                        compare_failures.append(node.name)

        self.state.update(pending_state)
        self.last_compare_failures = compare_failures
        return results

    def reset_state(self):
        """Forget all variables — the next run re-initializes each from its
        ReadValue init input (OpenVINO VariableState.reset)."""
        self.state.clear()

    def reset_variable(self, vid: str):
        """Reset ONE variable, others untouched (VariableState.reset):
        forgetting it makes the next run re-run its init input — correct
        for both static and input-dependent init subgraphs."""
        if vid not in self._variables():
            raise KeyError(f"unknown variable {vid!r}")
        self.state.pop(vid, None)

    def _variables(self):
        if not hasattr(self, "_variables_cache"):
            from pyopenvino_tpu.ops.state_ops import model_variables
            from pyopenvino_tpu.passes.shape_infer import infer_shapes

            self._variables_cache = model_variables(
                self.model, infer_shapes(self.model)
            )
        return self._variables_cache

    def query_state(self) -> Dict[str, np.ndarray]:
        """{variable_id: value}; variables not yet touched by a run()
        report their initial value (same contract as the compiled path,
        runtime/compiler.py query_state)."""
        from pyopenvino_tpu.ops.state_ops import initial_state

        out = initial_state(self._variables())
        out.update({k: np.asarray(v) for k, v in self.state.items()})
        return out

    def set_state(self, values: Dict[str, np.ndarray]):
        variables = self._variables()
        for vid, val in values.items():
            if vid not in variables:
                raise KeyError(f"unknown variable {vid!r}")
            var = variables[vid]
            self.state[vid] = np.asarray(val, dtype=var["dtype"]).reshape(
                var["shape"]
            )
