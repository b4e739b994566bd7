"""Device-mesh scale-out: data-parallel batch sharding + tensor-parallel
channel sharding over `jax.sharding.Mesh`.

The reference is strictly single-process / single-device (SURVEY.md §2.4);
this module supplies the TPU-native equivalents mandated by the BASELINE.json
north star:

  * DP — batches sharded over the 'data' mesh axis; weights replicated.
    XLA compiles the whole network per-shard with zero collectives (inference
    is embarrassingly parallel over batch), so scaling is linear up to ICI
    input-distribution costs.
  * TP — conv/matmul weights sharded per-output-channel over the 'model'
    axis (`P(..., 'model')` on the O dim of OIHW), activations replicated;
    XLA inserts all-gathers over ICI where a channel-sharded output feeds a
    spatially-mixing op.  For these CNNs TP is a capability demonstration
    (SURVEY.md §2.4: "optional for these small CNNs, required as a
    capability").

Multi-host: call `jax.distributed.initialize()` before building the mesh —
the mesh helper uses `jax.devices()`, which then spans all hosts, with the
'data' axis laid out across hosts (DCN) and 'model' within a host (ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1


def build_mesh(cfg: MeshConfig):
    import jax
    from jax.sharding import Mesh

    n = cfg.data * cfg.model
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.array(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(dev_array, ("data", "model"))


def _weight_pspec(model, key: str, arr):
    """PartitionSpec for one weight-pytree entry: shard conv/matmul output
    channels over 'model', replicate everything else."""
    from jax.sharding import PartitionSpec as P

    nid = int(key.split(".")[0])
    node = model.nodes[nid]
    consumers = [
        (model.nodes[dst], dport) for _, dst, dport in model.out_edges[nid]
    ]
    for consumer, dport in consumers:
        if consumer.op_type == "Convolution" and dport == 1:
            if arr.ndim >= 1 and arr.shape[0] % _model_axis_size() == 0:
                return P("model", *([None] * (arr.ndim - 1)))
        if consumer.op_type == "GroupConvolution" and dport == 1:
            # groups axis shards cleanly for depthwise
            if arr.shape[0] % _model_axis_size() == 0:
                return P("model", *([None] * (arr.ndim - 1)))
    return P()


_CURRENT_MESH = None


def _model_axis_size() -> int:
    return _CURRENT_MESH.shape["model"] if _CURRENT_MESH is not None else 1


def shard_compiled(compiled, mesh, tensor_parallel: bool = False):
    """Place a CompiledNetwork's weights on `mesh` and rebuild its jitted
    callables with explicit shardings.

    DP: inputs sharded P('data') on the batch axis of infer_batch.
    TP: weights channel-sharded as described above.
    Returns the same CompiledNetwork, mutated in place.
    """
    global _CURRENT_MESH
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    _CURRENT_MESH = mesh
    try:
        if tensor_parallel:
            w_shardings = {
                k: NamedSharding(mesh, _weight_pspec(compiled.model, k, v))
                for k, v in compiled.weights.items()
            }
        else:
            w_shardings = {
                k: NamedSharding(mesh, P()) for k in compiled.weights
            }
        compiled.weights = {
            k: jax.device_put(v, w_shardings[k])
            for k, v in compiled.weights.items()
        }

        # single-sample path: everything replicated except weights
        compiled._jitted = jax.jit(
            compiled._fn,
            in_shardings=(
                w_shardings,
                {n: NamedSharding(mesh, P()) for n in compiled.input_names},
            ),
        )

        # batched path: batch axis sharded over 'data'
        compiled._batched_cache.clear()

        def batched_fn(batch_size):
            if batch_size in compiled._batched_cache:
                return compiled._batched_cache[batch_size]
            param_infos = {
                n.name: n.outputs[n.out_port]
                for n in compiled.model.parameters
            }
            fn = compiled._fn

            def single(weights, example):
                ins = {
                    name: example[name].reshape(param_infos[name].shape)
                    for name in example
                }
                return fn(weights, ins)

            def batched(weights, batch):
                out = jax.vmap(single, in_axes=(None, 0))(weights, batch)
                return {
                    k: v.reshape((v.shape[0],) + v.shape[2:])
                    for k, v in out.items()
                }

            # P('data') shards the leading batch axis; trailing dims are
            # implicitly unsharded regardless of per-example rank
            data_sharding = {
                name: NamedSharding(mesh, P("data")) for name in param_infos
            }
            jitted = jax.jit(
                batched, in_shardings=(w_shardings, data_sharding)
            )
            compiled._batched_cache[batch_size] = jitted
            return jitted

        compiled.batched_fn = batched_fn
        compiled.mesh = mesh
        return compiled
    finally:
        _CURRENT_MESH = None
