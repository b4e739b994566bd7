"""Model cache — OpenVINO ``CACHE_DIR`` parity, TPU-native.

OpenVINO caches compiled blobs per (model, device, config) under
``core.set_property({"CACHE_DIR": path})`` so later process starts skip the
device compile.  The reference has nothing of the kind — it re-parses and
re-executes from scratch every run (inference_engine.py:74-83).

On TPU/XLA the expensive step is the XLA compile (tens of seconds for
GoogLeNet cold), not the Python trace (milliseconds).  So the TPU-native
cache is XLA's own *persistent compilation cache*: keyed by the lowered
StableHLO + compile options + backend fingerprint, it covers EVERY jit in
the process transparently — the batch=1 program, every batched bucket, the
capture/debug builds, sharded multi-device programs and stateful networks
alike — none of which a hand-rolled blob store keyed on the IR could serve
without re-deriving XLA's own key.  (The explicit blob path still exists as
``export_model``/``import_model`` — runtime/export.py — which additionally
skips the trace and the IR front-end.)

Wired through ``Core.set_property({"CACHE_DIR": ...})`` /
``IECore.set_config({"CACHE_DIR": ...})`` (api.py).
"""

from __future__ import annotations

import os


def enable_model_cache(path: str) -> str:
    """Point the persistent compilation cache at ``path`` (created if
    missing) and drop the min-compile-time/min-entry-size floors so even
    small test programs cache.  Returns the absolute path."""
    import jax

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default floors skip sub-second compiles — an inference cache wants
    # every program, the mnist-sized ones included
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def disable_model_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", None)


def current_cache_dir():
    """The active CACHE_DIR or None (``ie.get_config`` read-back)."""
    import jax

    return jax.config.jax_compilation_cache_dir


def cache_entries(path: str):
    """Cached program files under ``path`` (sorted, for tests/reporting)."""
    if not os.path.isdir(path):
        return []
    out = []
    for root, _, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files)
    return sorted(out)
