from pyopenvino_tpu.utils.platform import (
    force_cpu, persistent_compile_cache, select_device,
)

__all__ = ["force_cpu", "persistent_compile_cache", "select_device"]
