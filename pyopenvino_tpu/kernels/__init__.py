"""Pallas TPU kernel library — the hand-written hot path.

The reference's fastest kernel tier is `special` — im2col + one numpy GEMM
per Convolution (reference: op_plugins/Convolution.py:57-87, credited in
README.md:140).  Here that insight becomes MXU-native: a tiled Pallas GEMM
with a fused epilogue (INT8 per-output-channel dequant, bias add,
ReLU/Clamp), which serves Convolution (via compile-time patch extraction),
MatMul, and the fused Conv+Add+Activation groups produced by passes/fuse.py.
"""

from pyopenvino_tpu.kernels.gemm import fused_gemm

__all__ = ["fused_gemm"]
