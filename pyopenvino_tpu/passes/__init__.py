from pyopenvino_tpu.passes.shape_infer import ShapeAnalysis, infer_shapes

__all__ = ["ShapeAnalysis", "infer_shapes"]
