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
    elif any(os.environ.get(v) for v in (
        # Cloud TPU pod-slice launchers set these; a bare
        # initialize() then auto-discovers peers from the metadata
        # server — without this branch the docstring's argless call
        # silently left each host an isolated single-process group
        "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "MEGASCALE_COORDINATOR_ADDRESS",
    )):
        jax.distributed.initialize()
        multi = True
    return {
        "initialized": multi,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def infer_batch_multiprocess(compiled, local_inputs):
    """Data-parallel inference across a multi-process group: each process
    feeds its LOCAL batch rows ({name: (B_local, ...)} numpy) and receives
    its local rows of every output back as numpy.

    The local blocks are assembled into global sharded arrays
    (jax.make_array_from_process_local_data) over the attached mesh's batch
    sharding, one jitted execution runs collectively across all processes,
    and each process reads back only its addressable output shards — no
    host ever materializes the global batch.  Requires shard_compiled()
    (parallel/mesh.py) to have attached a mesh to `compiled`.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if compiled.mesh is None:
        raise ValueError("compiled network has no mesh; call shard_compiled")
    pspec = compiled._batch_pspec or P("data")
    sharding = NamedSharding(compiled.mesh, pspec)
    global_in = {
        k: jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(v)
        )
        for k, v in local_inputs.items()
    }
    b = next(iter(global_in.values())).shape[0]
    out = compiled.batched_fn(b)(compiled.weights, global_in)

    result = {}
    for k, v in out.items():
        shards = sorted(
            v.addressable_shards,
            key=lambda s: s.index[0].start if s.index[0].start else 0,
        )
        seen = set()
        blocks = []
        for s in shards:
            key = s.index[0].start
            if key in seen:
                continue  # replicated shard (e.g. model-axis copies)
            seen.add(key)
            blocks.append(np.asarray(s.data))
        result[k] = np.concatenate(blocks, axis=0)
    return result
