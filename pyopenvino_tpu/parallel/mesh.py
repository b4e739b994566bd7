"""Device-mesh scale-out: data-parallel batch sharding + tensor-parallel
channel sharding over `jax.sharding.Mesh`.

The reference is strictly single-process / single-device (SURVEY.md §2.4);
this module supplies the TPU-native equivalents mandated by the BASELINE.json
north star:

  * DP — batches sharded over the 'data' mesh axis; weights replicated.
    XLA compiles the whole network per-shard with zero collectives (inference
    is embarrassingly parallel over batch), so scaling is linear up to ICI
    input-distribution costs.
  * TP — conv weights sharded per-output-channel on the O dim of OIHW and
    MatMul weights on their output-channel dim (`P(..., 'model')`),
    activations replicated; XLA inserts all-gathers over ICI where a
    channel-sharded output feeds a spatially-mixing op.  INT8 per-channel
    scale vectors shard along with their weights.
  * SP — spatial partitioning, the CNN analogue of sequence/context
    parallelism (SURVEY.md §5: "halo-exchanged conv spatial partitioning"):
    activations sharded on the image-row (H) axis over 'spatial'; GSPMD
    inserts the halo exchanges (collective-permutes of boundary rows) each
    convolution/pool window needs.  Useful when one example's activations
    exceed a chip's HBM (large-resolution segmentation) — batch sharding
    cannot subdivide a single example, spatial sharding can.

Multi-host: call `parallel.initialize_multihost()` before building the
mesh — `jax.devices()` then spans all hosts, with the 'data' axis laid out
across hosts (DCN) and 'model' within a host (ICI).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1
    spatial: int = 1


def build_mesh(cfg: MeshConfig):
    import jax
    from jax.sharding import Mesh

    n = cfg.data * cfg.model * cfg.spatial
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.array(devices[:n]).reshape(
        cfg.data, cfg.model, cfg.spatial
    )
    return Mesh(dev_array, ("data", "model", "spatial"))


def put_global(host, sharding):
    """device_put, or a callback-built global array in a multi-process
    (multi-controller) group where some mesh devices are not addressable —
    every process holds the full host value, so the callback serves any
    requested index locally.  Shared by shard_compiled and the pipeline."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(host, sharding)
    host = np.asarray(host)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def _weight_pspec(model, key: str, arr, model_axis_size: int):
    """PartitionSpec for one weight-pytree entry: shard the output-channel
    dim of conv/matmul weights (and their per-channel scale vectors) over
    'model', replicate everything else."""
    from jax.sharding import PartitionSpec as P

    from pyopenvino_tpu.ir import attrs as A

    def shard_axis(axis: int):
        if arr.shape[axis] % model_axis_size == 0 and arr.shape[axis] > 1:
            spec = [None] * arr.ndim
            spec[axis] = "model"
            return P(*spec)
        return P()

    head = key.split(".")[0]
    if not head.isdigit():
        # 'folded.<src>.<port>' entries are statically-computed activations
        # (runtime/compiler.py _build_weights), not op weights — replicate.
        return P()
    nid = int(head)
    for _, dst, dport in model.out_edges[nid]:
        consumer = model.nodes[dst]
        if dport != 1:
            continue
        if consumer.op_type in ("Convolution", "GroupConvolution"):
            # weights OIHW / G-Co-...: output channels on axis 0; the
            # (O,1,1,1)-shaped scale vectors share that layout
            return shard_axis(0)
        if consumer.op_type == "MatMul":
            tb = A.get_bool(consumer.attrs, "transpose_b", False)
            if key.endswith(".scale"):
                # scale shape mirrors the weight's keepdims reduction:
                # (N,1) when transposed, (..,N) otherwise.  Rank-3 stacked
                # expert weights keep their scales replicated (the scale
                # has no expert dim — quantize.py reduces over it).
                if arr.ndim >= 3:
                    return P()
                return shard_axis(0 if tb else arr.ndim - 1)
            if arr.ndim >= 3:
                # EP: a rank-3+ MatMul weight is a stack of per-expert
                # matrices (tools/gen_moe.py) — shard the expert axis, so
                # each device computes its own experts and XLA turns the
                # gated ReduceSum combine into the EP all-reduce
                return shard_axis(0)
            return shard_axis(arr.ndim - 2 if tb else arr.ndim - 1)
    return P()


def shard_compiled(
    compiled, mesh, tensor_parallel: bool = False,
    spatial_parallel: bool = False,
):
    """Place a CompiledNetwork's weights on `mesh` and attach shardings so
    its own jit paths (single and batched) compile against them.

    DP: infer_batch's leading axis is sharded P('data').
    TP: weights channel-sharded as described in _weight_pspec.
    SP: with ``spatial_parallel``, batched activations additionally shard
        their H (rows) axis over 'spatial' — GSPMD inserts the halo
        exchanges every conv/pool window needs (module docstring).
    Returns the same CompiledNetwork, mutated in place.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    model_axis = mesh.shape["model"]
    if (
        tensor_parallel and spatial_parallel
        and model_axis > 1 and mesh.shape.get("spatial", 1) > 1
    ):
        # This stack's SPMD partitioner MISCOMPILES the combination: a
        # conv with a spatially-sharded input and an output-channel-sharded
        # kernel returns wrong values (minimal repro in
        # docs/MEASUREMENTS.md "Backend-specific findings"; caught by the
        # dryrun's distinct-row parity check).  DP composes with either.
        raise ValueError(
            "tensor_parallel and spatial_parallel cannot be combined on "
            "this backend (XLA SPMD partitioner miscompiles conv with "
            "both shardings — docs/MEASUREMENTS.md); use one of them "
            "with data parallelism instead"
        )
    if tensor_parallel:
        w_shardings = {
            k: NamedSharding(
                mesh, _weight_pspec(compiled.model, k, v, model_axis)
            )
            for k, v in compiled.weights.items()
        }
    else:
        w_shardings = {k: NamedSharding(mesh, P()) for k in compiled.weights}

    compiled.weights = {
        k: put_global(v, w_shardings[k]) for k, v in compiled.weights.items()
    }

    # single-sample path: everything replicated except weights
    compiled._jitted = jax.jit(
        compiled._fn,
        in_shardings=(
            w_shardings,
            {n: NamedSharding(mesh, P()) for n in compiled.input_names},
        ),
    )

    # batched path: compiler.batched_fn consults these (the batching logic
    # has a single implementation in runtime/compiler.py)
    compiled.mesh = mesh
    compiled._w_shardings = w_shardings
    compiled._batch_pspec = P("data")
    if spatial_parallel and mesh.shape.get("spatial", 1) > 1:
        compiled._spatial_axis = "spatial"
    else:
        compiled._spatial_axis = None
    compiled._batched_cache.clear()
    return compiled
