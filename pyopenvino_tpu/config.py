"""Typed engine configuration.

The reference's only runtime knob is the stringly-typed
``Executable_Network.kernel_type`` attribute (reference:
pyopenvino/inference_engine.py:215; README.md:133-136 documents values
naive/numpy/special).  Here that becomes one typed dataclass covering the
execution backend, quantization mode, device mesh and batching policy.
"""

from __future__ import annotations

import dataclasses
import enum


class Backend(enum.Enum):
    """Execution backend for a compiled network.

    INTERPRETER mirrors the reference's layer-at-a-time numpy execution
    (reference: pyopenvino/inference_engine.py:259-292) and exists for
    differential testing and per-layer debugging.  XLA traces the whole graph
    into one jitted function.  PALLAS additionally routes hot ops through
    hand-written Pallas TPU kernels.
    """

    INTERPRETER = "interpreter"
    XLA = "xla"
    PALLAS = "pallas"


class QuantMode(enum.Enum):
    NONE = "none"          # FP32 weights/activations
    BF16 = "bf16"          # bfloat16 weights + activations (MXU native)
    INT8_WEIGHT = "int8w"  # INT8 weight-only, per-output-channel scales
    INT8_FULL = "int8"     # INT8 weights + activations (calibrated scales,
                           # int8xint8 MXU, f32 dequant epilogue)


# CLI-facing quant mode names (the enum VALUES differ for compat reasons:
# INT8_FULL's value is "int8") — the single mapping every app/tool uses.
QUANT_NAME_TO_MODE = {
    "none": QuantMode.NONE,
    "bf16": QuantMode.BF16,
    "int8w": QuantMode.INT8_WEIGHT,
    "int8full": QuantMode.INT8_FULL,
}

# Map the reference's kernel_type strings onto backends so the facade stays
# drop-in compatible (reference kernel types: README.md:133-136).
KERNEL_TYPE_TO_BACKEND = {
    "naive": Backend.INTERPRETER,
    "numpy": Backend.INTERPRETER,
    "special": Backend.XLA,
    "interpreter": Backend.INTERPRETER,
    "xla": Backend.XLA,
    "pallas": Backend.PALLAS,
}


@dataclasses.dataclass
class Config:
    backend: Backend = Backend.XLA
    quant: QuantMode = QuantMode.NONE

    # Device mesh axes.  data = batch sharding (DP), model = channel sharding
    # (TP), spatial = image-row sharding (SP, GSPMD halo exchange).
    # (1, 1, 1) means single chip; the mesh layer in parallel/mesh.py builds
    # a jax Mesh from these.  model > 1 and spatial > 1 cannot be combined
    # (this stack's SPMD partitioner miscompiles TP×SP —
    # docs/MEASUREMENTS.md "Backend-specific findings").
    mesh_data: int = 1
    mesh_model: int = 1
    mesh_spatial: int = 1

    # Batching policy for serving: pad request batches up to the nearest
    # bucket to avoid jit-cache thrash (SURVEY.md §7 hard part 5).
    batch_buckets: tuple = (1, 2, 4, 8, 16, 32)

    # Debugging: per-layer timing in interpreter mode, and golden feature-map
    # comparison (the reference's expected_result hook,
    # reference: pyopenvino/inference_engine.py:214,284-287).
    verbose: bool = False

    # Compute dtype for the XLA/Pallas path ("float32" or "bfloat16").
    compute_dtype: str = "float32"

    # INT8-FULL quantized dataflow: store qualifying conv→conv activation
    # edges as int8 in HBM (producer epilogue requantizes; consumer feeds
    # the int8 tensor straight to the MXU integer path) instead of
    # round-tripping bf16/f32.  Halves HBM bytes on qualifying edges;
    # measured ~neutral on v5e for GoogLeNet/SSD (the trunks are already
    # compute/relayout-bound at these shapes) — kept on as the designed
    # INT8-FULL dataflow, gate here for A/B measurement.
    int8_dataflow: bool = True

    # INT8-FULL activation-calibration clipping percentile (100.0 = pure
    # max-abs).  99.9 is the standard outlier defense (OpenVINO POT /
    # TensorRT calibrators); measured on synthetic-weight SSD it cuts the
    # int8full mAP delta 24.5 → 20.0 while percentiles ≤99.5 over-clip
    # and hurt badly (37.7 / 49.0) — see passes/calibrate.py.
    calibration_percentile: float = 100.0

    # Calibration method: "percentile" (max-abs / clipped percentile, the
    # field above) or "kl" — TensorRT-style entropy calibration that picks
    # each tensor's clip threshold by minimizing the KL divergence between
    # the observed |activation| histogram and its 128-level quantized
    # rendering (passes/calibrate.py _calibrate_kl).
    calibration_method: str = "percentile"

    # Analytic bias correction for int8 weight quantization (OpenVINO
    # POT's BiasCorrection): fold the expected output shift of weight
    # rounding, E[(W − deq(W_q))·x] over calibration samples, into each
    # fused layer's bias (passes/bias_correct.py).  Needs calibration
    # samples (works for both INT8_WEIGHT and INT8_FULL when provided).
    bias_correction: bool = False

    # First/last-layer exclusion for INT8 weight quantization: weights
    # with fewer than this many elements stay float (0 = quantize
    # everything).  For detection/regression heads whose tiny 1×1 convs
    # land quantization error directly on box coordinates
    # (passes/quantize.py quantize_weights).
    quant_min_elems: int = 0

    # Depthwise convolution emission.  "native" = XLA feature_group_count
    # conv (fastest: ~5x the shifted-MAC on TPU v5e, re-measured after the
    # 2026-08 stack update fixed the grouped-conv compile hang).
    # "shifted_mac" = kh*kw shifted multiply-accumulates, the round-1
    # workaround for backends where grouped-conv compilation pathologically
    # hangs (kept as an escape hatch).
    depthwise_mode: str = "native"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
