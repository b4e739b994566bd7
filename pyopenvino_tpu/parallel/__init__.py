from pyopenvino_tpu.parallel.distributed import initialize_multihost
from pyopenvino_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    shard_compiled,
)
from pyopenvino_tpu.parallel.pipeline import (
    PipelinedNetwork,
    build_pipeline_mesh,
    compile_pipelined,
)

__all__ = [
    "MeshConfig",
    "build_mesh",
    "shard_compiled",
    "initialize_multihost",
    "PipelinedNetwork",
    "build_pipeline_mesh",
    "compile_pipelined",
]
