"""Serving layer: continuous batching over the compiled network.

The reference's serving story is a 100 ms-tick GUI loop doing one blocking
batch=1 infer per tick (reference: draw-and-infer.py:54-76).  Here serving is
a first-class subsystem: an asynchronous request queue feeding a scheduler
that groups requests into padded batch buckets (one jit cache entry per
bucket — no recompile thrash, SURVEY.md §7 hard part 5) and executes them on
the device while callers wait on futures.
"""

from pyopenvino_tpu.serving.server import InferenceServer, ServerStats

__all__ = ["InferenceServer", "ServerStats"]
