"""Graph boundary ops: Parameter, Const, Result.

Reference semantics: op_plugins/{Parameter,Const,Result}.py.  In this
framework the executor/compiler handles binding directly (inputs bound by
Parameter node name, outputs collected per Result node name — reference:
inference_engine.py:295-321), so these registrations only provide shape
inference and the interpreter-mode pass-through.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyopenvino_tpu.ops.spec import Op, ShapeResult, TValue, register


@register
class Parameter(Op):
    type_name = "Parameter"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({node.out_port: node.outputs[node.out_port].shape})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        raise RuntimeError("Parameter nodes are bound by the executor")

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        raise RuntimeError("Parameter nodes are bound by the compiler")


@register
class Const(Op):
    type_name = "Const"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        info = node.outputs[node.out_port]
        return ShapeResult(
            {node.out_port: info.shape},
            {node.out_port: node.const} if node.const is not None else {},
        )

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        if node.const is None:
            raise RuntimeError(f"Const {node.name} has no weights loaded")
        return {node.out_port: node.const}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        raise RuntimeError("Const nodes are materialized by the compiler")


@register
class Result(Op):
    type_name = "Result"

    def infer_shapes(self, node, in_shapes, in_values) -> ShapeResult:
        return ShapeResult({})

    def ref_compute(self, node, inputs) -> Dict[int, np.ndarray]:
        return {}

    def emit(self, ctx, node, inputs) -> Dict[int, TValue]:
        return {}
