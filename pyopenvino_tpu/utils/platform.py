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
