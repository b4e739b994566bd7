"""Op registry and the layout-tracked trace value.

Reference contract being replaced: one module per op type, discovered by file
name, exposing ``compute(node, inputs, kernel_type, debug) -> {port: ndarray}``
(reference: pyopenvino/inference_engine.py:28-43, README.md:127-131).  Here
each op registers a typed implementation with three entry points:

  * ``ref_compute``  — numpy, exact reference semantics (quirks fixed — see
    SURVEY.md §7), used by the interpreter backend and constant folding;
  * ``emit``         — JAX tracing for the compiled XLA/Pallas path;
  * ``infer_shapes`` — static shape inference, validated against every
    declared port shape of the four shipped models.

Layout: 4-D activations flow through the compiled path in NHWC ("CL",
channels-last) because conv/pool on the TPU MXU/VPU want the channel dim in
lanes; shape-sensitive ops (Reshape/Transpose/MatMul/...) pull values back to
the logical NCHW layout.  XLA cancels adjacent transposes, so a CL→L→CL
round-trip between two convs costs nothing after fusion.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np


class TValue:
    """A traced value + physical-layout tag.

    layout == "L":  physical array shape equals the logical (IR-declared) shape
    layout == "CL": logical NCHW (N, C, H, W) stored physically as (N, H, W, C)
    """

    __slots__ = ("arr", "layout", "qscale", "act_scale")

    def __init__(self, arr, layout: str = "L", qscale=None, act_scale=None):
        assert layout in ("L", "CL")
        if layout == "CL":
            assert len(arr.shape) == 4, "CL layout is only defined for 4-D"
        self.arr = arr
        self.layout = layout
        # Per-output-channel dequant scales when `arr` holds int8 weights
        # (QuantMode.INT8_WEIGHT); consumed by ctx.weight_for / Pallas kernels.
        self.qscale = qscale
        # Per-tensor storage scale when `arr` holds an int8-quantized
        # ACTIVATION (QuantMode.INT8_FULL inter-layer storage — the
        # compiler requantizes producer epilogues so bandwidth-bound edges
        # carry 1 byte/element through HBM; runtime/compiler.py
        # _find_int8_edges).  x ≈ arr * act_scale.
        self.act_scale = act_scale

    @property
    def shape(self) -> Tuple[int, ...]:
        s = tuple(self.arr.shape)
        if self.layout == "CL":
            n, h, w, c = s
            return (n, c, h, w)
        return s

    @property
    def dtype(self):
        return self.arr.dtype

    def nchw(self):
        """Physical array in logical layout."""
        if self.layout == "CL":
            return self.arr.transpose(0, 3, 1, 2)
        return self.arr

    def nhwc(self):
        """Physical array in channels-last layout (4-D only)."""
        if self.layout == "CL":
            return self.arr
        assert len(self.arr.shape) == 4, f"nhwc on rank-{len(self.arr.shape)}"
        return self.arr.transpose(0, 2, 3, 1)

    def logical(self) -> "TValue":
        return TValue(self.nchw(), "L")

    @staticmethod
    def quantize(x, scale):
        """round(x/scale) clipped to the symmetric ±127 code domain —
        the single inverse of dequant(); every producer-side requantize
        (compiler store(), conv/matmul on-the-fly input quantize, LRN
        epilogue) goes through here."""
        import jax.numpy as jnp

        return jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127
        ).astype(jnp.int8)

    def dequant(self, compute_dtype=None) -> "TValue":
        """Dequantized copy when ``arr`` holds int8 activation codes
        (act_scale set); returns self unchanged otherwise.  The single
        definition of x ≈ arr·act_scale — every consumer-side dequant
        (compiler guard, Result/capture, Concat mixed-scale fallback,
        LRN interpret path) goes through here.  The f32 multiply fuses
        into the consumer's first read, so the HBM side stays
        1 byte/element."""
        if self.act_scale is None:
            return self
        import jax.numpy as jnp

        arr = self.arr.astype(jnp.float32) * self.act_scale
        if compute_dtype is not None:
            arr = arr.astype(compute_dtype)
        return TValue(arr, self.layout, qscale=self.qscale)

    def __repr__(self):
        return f"TValue({self.shape}, {self.dtype}, {self.layout})"


@dataclasses.dataclass
class ShapeResult:
    """Outcome of shape inference: {out_port: shape} plus, when the op's
    output is statically computable (ShapeOf & friends), {out_port: value}."""

    shapes: Dict[int, Tuple[int, ...]]
    values: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)


class Op:
    """Base class; subclasses set ``type_name`` and override the hooks."""

    type_name: str = ""

    # Input ports whose ``emit`` understands an int8-stored activation
    # (a TValue with act_scale set — INT8-FULL inter-layer storage,
    # runtime/compiler.py _find_int8_edges): a tuple of port numbers, or
    # "all".  Any int8 value reaching a port NOT listed here is
    # dequantized by the compiler's central guard before emit, so this
    # flag is a performance contract, never a correctness requirement.
    int8_ports = ()

    def ref_compute(
        self, node, inputs: Dict[int, np.ndarray]
    ) -> Dict[int, np.ndarray]:
        raise NotImplementedError(f"{self.type_name}.ref_compute")

    def emit(self, ctx, node, inputs: Dict[int, TValue]) -> Dict[int, TValue]:
        # Default: run the op's logical semantics via jnp by reusing numpy
        # code paths is NOT possible in trace mode, so ops must override.
        raise NotImplementedError(f"{self.type_name}.emit")

    def infer_shapes(
        self,
        node,
        in_shapes: Dict[int, Tuple[int, ...]],
        in_values: Dict[int, Optional[np.ndarray]],
    ) -> ShapeResult:
        raise NotImplementedError(f"{self.type_name}.infer_shapes")


REGISTRY: Dict[str, Op] = {}


def register(cls):
    """Class decorator: instantiate and register by type_name."""
    inst = cls()
    assert inst.type_name, cls
    REGISTRY[inst.type_name] = inst
    return cls


def get_op(type_name: str) -> Op:
    if type_name not in REGISTRY:
        raise KeyError(f"unsupported op type: {type_name!r}")
    return REGISTRY[type_name]


def supported_ops() -> Tuple[str, ...]:
    return tuple(sorted(REGISTRY))
