from pyopenvino_tpu.parallel.distributed import initialize_multihost
from pyopenvino_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    shard_compiled,
)

__all__ = [
    "MeshConfig",
    "build_mesh",
    "shard_compiled",
    "initialize_multihost",
]
