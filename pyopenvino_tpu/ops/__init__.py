"""Op library: importing this package registers every op implementation.

The reference discovers plugins by globbing a directory and matching file
names against IR type attributes (reference: inference_engine.py:28-43);
here registration is explicit imports into a typed registry (ops/spec.py) so
unsupported ops fail loudly at compile time rather than mid-run
(the reference only warns pre-run and sys.exit()s at execution,
inference_engine.py:62-71,270-272).
"""

from pyopenvino_tpu.ops.spec import REGISTRY, Op, ShapeResult, TValue, get_op, supported_ops

# registration side-effects
from pyopenvino_tpu.ops import conv  # noqa: F401
from pyopenvino_tpu.ops import elementwise  # noqa: F401
from pyopenvino_tpu.ops import extended  # noqa: F401
from pyopenvino_tpu.ops import io_ops  # noqa: F401
from pyopenvino_tpu.ops import matmul  # noqa: F401
from pyopenvino_tpu.ops import nms  # noqa: F401
from pyopenvino_tpu.ops import pool  # noqa: F401
from pyopenvino_tpu.ops import proposal  # noqa: F401
from pyopenvino_tpu.ops import recurrent  # noqa: F401
from pyopenvino_tpu.ops import roi  # noqa: F401
from pyopenvino_tpu.ops import shape_ops  # noqa: F401
from pyopenvino_tpu.ops import ssd  # noqa: F401
from pyopenvino_tpu.ops import state_ops  # noqa: F401
from pyopenvino_tpu.ops import subgraph  # noqa: F401
from pyopenvino_tpu.ops import yolo  # noqa: F401

__all__ = [
    "REGISTRY",
    "Op",
    "ShapeResult",
    "TValue",
    "get_op",
    "supported_ops",
]
