"""Multi-host initialization for pod-slice serving.

The reference is single-process (SURVEY.md §2.4).  On a TPU pod slice every
host runs the same program; `initialize_multihost()` wires them into one
JAX process group so `jax.devices()` spans all hosts and the mesh layer
(parallel/mesh.py) lays the 'data' axis across hosts (DCN) and 'model'
within a host (ICI).  After this, the DP/TP sharding code is unchanged —
XLA compiles the same program per host with the collectives it needs.

Typical pod-slice launch (one command per host, e.g. via GCE metadata or a
scheduler):

    python -c "
    from pyopenvino_tpu.parallel.distributed import initialize_multihost
    initialize_multihost()                        # TPU: auto-discovers peers
    ... build mesh over jax.devices(), serve ...
    "

Single-host (this rig) is a no-op: call it unconditionally in launch
scripts.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed when running under a multi-host launcher;
    no-op on a single host.  Returns a summary dict for logging.

    On Cloud TPU the three arguments auto-discover from the metadata server;
    elsewhere pass them explicitly (or set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    multi = bool(coordinator_address) or (num_processes or 0) > 1
    if multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "initialized": multi,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
