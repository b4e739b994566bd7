from pyopenvino_tpu.runtime.interpreter import Interpreter
from pyopenvino_tpu.runtime.compiler import CompiledNetwork, compile_model

__all__ = ["Interpreter", "CompiledNetwork", "compile_model"]
