"""Platform selection helpers.

This environment's interpreter startup (sitecustomize) registers a remote
TPU backend and can clobber process-level JAX_PLATFORMS/XLA_FLAGS, so env
vars alone are unreliable — the knobs must be re-asserted in-process before
the first backend use (same dance as tests/conftest.py).
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int | None = None):
    """Pin this process to the CPU backend, optionally with n virtual
    devices for mesh testing.  Must run before the first jax backend use."""
    import jax

    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")


def select_device(device: str):
    """CLI helper: 'cpu' pins to CPU, 'auto'/'tpu' leave the default
    (TPU when the tunnel is up)."""
    if device == "cpu":
        force_cpu()


def persistent_compile_cache(repo_root=None):
    """Point jax at the repo's persistent XLA compile cache (.jax_cache)
    — the one wiring shared by bench.py and tools/benchmark_app.py
    (a cold SSD batch-1 chain compile is ~5 min; cached it is seconds)."""
    import os

    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(repo_root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache — harmless
