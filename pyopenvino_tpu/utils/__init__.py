from pyopenvino_tpu.utils.platform import force_cpu, select_device

__all__ = ["force_cpu", "select_device"]
