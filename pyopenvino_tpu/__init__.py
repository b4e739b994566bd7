"""pyopenvino_tpu — a TPU-native inference engine with the capabilities of
yas-sim/pyopenvino, re-designed for JAX / XLA / Pallas / pjit.

The reference (studied at /root/reference, cited throughout as file:line) is a
pure-Python, layer-at-a-time interpreter over a networkx graph.  This framework
instead parses OpenVINO IR v10 into a typed immutable graph, runs compile-time
passes (constant folding, fusion, layout, quantization), traces the whole graph
into a single JAX function and compiles it with XLA onto the MXU, with Pallas
kernels for hot ops and `jax.sharding` meshes for multi-chip scale-out.

Public API mirrors the reference's OpenVINO-compatible facade
(reference: pyopenvino/inference_engine.py:47-321):

    from pyopenvino_tpu import IECore
    ie = IECore()
    net = ie.read_network('models/mnist.xml', 'models/mnist.bin')
    exenet = ie.load_network(net, 'TPU')
    result = exenet.infer({'conv2d_input': img})
"""

from pyopenvino_tpu.api import (AsyncInferQueue, Core, CompiledModel, IECore,
                                IENetwork, ExecutableNetwork, InferRequest,
                                VariableState)
from pyopenvino_tpu.config import Config, Backend, QuantMode
from pyopenvino_tpu.preprocess import PrePostProcessor

__version__ = "0.1.0"

__all__ = [
    "AsyncInferQueue",
    "IECore",
    "Core",
    "CompiledModel",
    "IENetwork",
    "ExecutableNetwork",
    "InferRequest",
    "VariableState",
    "Config",
    "Backend",
    "QuantMode",
    "PrePostProcessor",
]
