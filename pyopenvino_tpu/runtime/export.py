"""Compiled-model export/import — OpenVINO blob-cache parity, TPU-native.

OpenVINO lets a user serialize a compiled network and later load it without
the original IR (``ExecutableNetwork.export`` / ``ie.import_network``; the
2.0 spelling is ``compiled_model.export_model`` / ``core.import_model``).
The reference has no analogue at all — it re-parses the XML and re-decodes
the ``.bin`` on every process start (reference: inference_engine.py:74-83,
Const.py:11-14).

The TPU-native equivalent is ``jax.export`` AOT serialization: the whole
traced graph — every compile-time pass already applied (constant folding,
fusion, INT8 quantization rewrite, int8 dataflow) — is lowered to a
versioned StableHLO module and written to disk next to the processed weight
pytree.  Importing deserializes the module and runs it WITHOUT the IR
front-end, the pass pipeline, or a Python re-trace; XLA compiles the
StableHLO for whatever backend the importing process runs on.

Artifact layout (one ``.ovtpu`` zip):

    meta.json            format version, io names/shapes/dtypes, config,
                         export platforms, which callables are inside
    weights.npz          processed weight pytree (int8 + scales for
                         quantized modes; bf16 stored as tagged uint16)
    fn_b1.jaxexport      batch=1 program (the ``infer`` path)
    fn_batched.jaxexport shape-polymorphic batched program (symbolic
                         leading batch dim ``b``) — one artifact serves
                         every batch size; falls back to...
    fn_b{N}.jaxexport    fixed-bucket batched programs, for graphs whose
                         batch rule resists symbolic shapes

Stateful networks (ReadValue/Assign) export too: the artifact carries the
step program ``fn(weights, inputs, state) -> (outputs, new_state)`` plus the
initial state pytree (``state.npz``, fresh flags included), and the imported
network threads donated state exactly like CompiledNetwork.

Mesh-sharded networks export **per-mesh-shape lowerings**: the sharded
programs are serialized with their HloShardings and the mesh axes/shape plus
per-weight PartitionSpecs recorded in meta; importing rebuilds an
equally-shaped mesh from local devices and runs without the IR front-end or
the pass pipeline.  (The artifact is pinned to that mesh SHAPE — any devices
of the same count work.)  Stateful x sharded remains refused, matching the
runtime (shard_compiled does not thread state shardings).
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Dict, Optional, Sequence

import numpy as np

_FORMAT_VERSION = 1
_BF16_TAG = "::bf16"


# -- weight pytree <-> npz (npz cannot represent ml_dtypes.bfloat16) --------

def _encode_weights(weights) -> bytes:
    import ml_dtypes

    out = {}
    for k, v in weights.items():
        arr = np.asarray(v)
        if arr.dtype == ml_dtypes.bfloat16:
            out[k + _BF16_TAG] = arr.view(np.uint16)
        else:
            out[k] = arr
    buf = io.BytesIO()
    np.savez_compressed(buf, **out)
    return buf.getvalue()


def _decode_weights(blob: bytes) -> Dict[str, np.ndarray]:
    import ml_dtypes

    loaded = {}
    with np.load(io.BytesIO(blob)) as data:
        for k in data.files:
            if k.endswith(_BF16_TAG):
                loaded[k[: -len(_BF16_TAG)]] = data[k].view(ml_dtypes.bfloat16)
            else:
                loaded[k] = data[k]
    return loaded


def _weights_spec(weights):
    import jax

    return {
        k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
        for k, v in weights.items()
    }


def _export_platforms():
    """Lowering platforms for the artifact.  The compiled graphs are
    plain StableHLO (no custom calls on the XLA backend), so one artifact
    can serve both the CPU test rig and the TPU deployment target."""
    return ("cpu", "tpu")


def _try_export(fn, args, platforms):
    """jax.export with multi-platform lowering; retry native-platform-only
    when a kernel (e.g. a Pallas custom call on the PALLAS backend) cannot
    lower for a platform it was not built on."""
    import jax
    from jax import export as jexport

    jitted = jax.jit(fn)
    try:
        return jexport.export(jitted, platforms=platforms)(*args), platforms
    except Exception:
        exported = jexport.export(jitted)(*args)
        return exported, (jexport.default_export_platform(),)


def export_compiled(
    compiled,
    path: str,
    buckets: Sequence[int] = (8, 32),
) -> None:
    """Serialize a CompiledNetwork into a self-contained ``.ovtpu`` blob.

    ``buckets`` is the fixed-batch fallback set, used only when the graph's
    batch rule cannot be exported shape-polymorphically."""
    import jax
    from jax import export as jexport

    if compiled.mesh is not None and compiled.variables:
        raise NotImplementedError(
            "stateful + sharded export is unsupported (the runtime's "
            "shard_compiled does not thread state shardings either); "
            "export the unsharded stateful network instead"
        )
    if compiled.variables:
        return _export_stateful(compiled, path)
    if compiled.mesh is not None:
        return _export_sharded(compiled, path, buckets)

    weights = compiled.weights
    w_spec = _weights_spec(weights)
    param_infos = _param_infos(compiled)
    in_spec = {
        name: jax.ShapeDtypeStruct(tuple(info.shape), np.dtype(info.dtype))
        for name, info in param_infos.items()
    }
    platforms = _export_platforms()

    members: Dict[str, bytes] = {}

    # batch=1 program (the `infer` path)
    exp_b1, used_platforms = _try_export(
        compiled._fn, (w_spec, in_spec), platforms
    )
    members["fn_b1.jaxexport"] = bytes(exp_b1.serialize())

    # batched program — shape-polymorphic first, fixed buckets as fallback
    batched = _make_batched(compiled)
    batched_mode = "symbolic"
    fixed = []
    try:
        (b,) = jexport.symbolic_shape("b")
        sym_spec = {
            name: jax.ShapeDtypeStruct(
                (b,) + tuple(info.shape[1:]), np.dtype(info.dtype)
            )
            for name, info in param_infos.items()
        }
        exp_bn, _ = _try_export(batched, (w_spec, sym_spec), used_platforms)
        members["fn_batched.jaxexport"] = bytes(exp_bn.serialize())
    except Exception:
        batched_mode = "buckets"
        for n in sorted(set(int(x) for x in buckets)):
            bn_spec = {
                name: jax.ShapeDtypeStruct(
                    (n,) + tuple(info.shape[1:]), np.dtype(info.dtype)
                )
                for name, info in param_infos.items()
            }
            exp_bn, _ = _try_export(batched, (w_spec, bn_spec), used_platforms)
            members[f"fn_b{n}.jaxexport"] = bytes(exp_bn.serialize())
            fixed.append(n)

    meta = {
        "format_version": _FORMAT_VERSION,
        "config": _config_meta(compiled),
        "platforms": list(used_platforms),
        "batched_mode": batched_mode,
        "buckets": fixed,
        **_io_meta(compiled),
    }

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("weights.npz", _encode_weights(weights))
        for name, blob in members.items():
            zf.writestr(name, blob)


def _param_infos(compiled):
    return {
        n.name: n.outputs[n.out_port] for n in compiled.model.parameters
    }


def _io_meta(compiled):
    infos = _param_infos(compiled)
    return {
        "inputs": {
            name: {
                "shape": [int(d) for d in info.shape],
                "dtype": np.dtype(info.dtype).name,
            }
            for name, info in infos.items()
        },
        "outputs": [n.name for n in compiled.model.results],
    }


def _config_meta(compiled):
    cfg = dataclasses.asdict(compiled.config)
    cfg["backend"] = compiled.config.backend.value
    cfg["quant"] = compiled.config.quant.value
    return cfg


def _export_stateful(compiled, path: str) -> None:
    """Stateful artifact: the step program fn(weights, inputs, state) ->
    (outputs, new_state) plus the initial state pytree.  Runs at the IR's
    declared shapes (batch baked via IENetwork.reshape when needed), so
    there are no batched members — matching CompiledNetwork.batched_fn's
    stateful refusal."""
    import jax

    weights = compiled.weights
    w_spec = _weights_spec(weights)
    infos = _param_infos(compiled)
    in_spec = {
        name: jax.ShapeDtypeStruct(tuple(info.shape), np.dtype(info.dtype))
        for name, info in infos.items()
    }
    state0 = {k: np.asarray(v) for k, v in compiled.fresh_state().items()}
    state_spec = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in state0.items()
    }
    exp, used_platforms = _try_export(
        compiled._fn, (w_spec, in_spec, state_spec), _export_platforms()
    )

    meta = {
        "format_version": _FORMAT_VERSION,
        "config": _config_meta(compiled),
        "platforms": list(used_platforms),
        "batched_mode": "none",
        "buckets": [],
        "stateful": True,
        "variables": {
            vid: {
                "shape": [int(d) for d in var["shape"]],
                "dtype": np.dtype(var["dtype"]).name,
                "dynamic_init": bool(var["dynamic_init"]),
            }
            for vid, var in compiled.variables.items()
        },
        **_io_meta(compiled),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("weights.npz", _encode_weights(weights))
        zf.writestr("state.npz", _encode_weights(state0))
        zf.writestr("fn_b1.jaxexport", bytes(exp.serialize()))


def _export_sharded(compiled, path: str, buckets: Sequence[int]) -> None:
    """Per-mesh-shape lowerings: serialize the already-sharded programs
    (their HloShardings ride inside the StableHLO) with the mesh
    axes/shape and per-weight PartitionSpecs in meta, so the importing
    process rebuilds an equally-shaped mesh and runs them directly —
    no IR, no passes, no shard_compiled."""
    import jax
    from jax import export as jexport

    mesh = compiled.mesh
    host_weights = {k: np.asarray(v) for k, v in compiled.weights.items()}
    w_spec = _weights_spec(host_weights)
    infos = _param_infos(compiled)
    in_spec = {
        name: jax.ShapeDtypeStruct(tuple(info.shape), np.dtype(info.dtype))
        for name, info in infos.items()
    }
    # sharded lowerings pin the device count — export native-platform only
    platform = (jexport.default_export_platform(),)

    members: Dict[str, bytes] = {}
    exp_b1 = jexport.export(compiled._jitted, platforms=platform)(
        w_spec, in_spec
    )
    members["fn_b1.jaxexport"] = bytes(exp_b1.serialize())

    n_dev = mesh.devices.size
    fixed = []
    for n in sorted(set(int(x) for x in buckets)):
        if n % max(1, mesh.shape.get("data", 1)):
            continue  # batch must divide over the data axis
        bn_spec = {
            name: jax.ShapeDtypeStruct(
                (n,) + tuple(info.shape[1:]), np.dtype(info.dtype)
            )
            for name, info in infos.items()
        }
        exp_bn = jexport.export(
            compiled.batched_fn(n), platforms=platform
        )(w_spec, bn_spec)
        members[f"fn_b{n}.jaxexport"] = bytes(exp_bn.serialize())
        fixed.append(n)

    meta = {
        "format_version": _FORMAT_VERSION,
        "config": _config_meta(compiled),
        "platforms": list(platform),
        "batched_mode": "buckets",
        "buckets": fixed,
        "mesh": {
            "axis_names": list(mesh.axis_names),
            "shape": [int(mesh.shape[a]) for a in mesh.axis_names],
            "num_devices": int(n_dev),
        },
        "w_pspecs": {
            k: [a if a is None else str(a) for a in tuple(s.spec)]
            for k, s in compiled._w_shardings.items()
        },
        "batch_pspec": [
            a if a is None else str(a) for a in tuple(compiled._batch_pspec)
        ],
        **_io_meta(compiled),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("weights.npz", _encode_weights(host_weights))
        for name, blob in members.items():
            zf.writestr(name, blob)


def _make_batched(compiled):
    """The single-device batched callable, mirroring
    CompiledNetwork.batched_fn's contract: rows reshape to the declared
    per-example shape; outputs collapse the declared unit batch dim."""
    import jax

    param_infos = {
        n.name: n.outputs[n.out_port] for n in compiled.model.parameters
    }
    collapse = {
        n.name: (len(n.inputs[0].shape) > 0 and n.inputs[0].shape[0] == 1)
        for n in compiled.model.results
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
            if collapse.get(k, True)
            else v
            for k, v in out.items()
        }

    return batched


class ImportedNetwork:
    """A deserialized compiled network: runs without the IR front-end or
    the pass pipeline.  Offers the CompiledNetwork inference surface
    (``infer`` / ``infer_batch`` / ``__call__``); graph-introspection
    surfaces (profile, capture, verify_against_interpreter) need the
    original model and are deliberately absent."""

    def __init__(self, path: str):
        import jax
        from jax import export as jexport

        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read("meta.json"))
            if meta["format_version"] > _FORMAT_VERSION:
                raise ValueError(
                    f"artifact format v{meta['format_version']} is newer "
                    f"than this runtime (v{_FORMAT_VERSION})"
                )
            self.meta = meta
            weights = _decode_weights(zf.read("weights.npz"))
            self._exp_b1 = jexport.deserialize(
                bytearray(zf.read("fn_b1.jaxexport"))
            )
            self._exp_batched = None
            self._exp_buckets: Dict[int, object] = {}
            if meta["batched_mode"] == "symbolic":
                self._exp_batched = jexport.deserialize(
                    bytearray(zf.read("fn_batched.jaxexport"))
                )
            else:
                for n in meta["buckets"]:
                    self._exp_buckets[n] = jexport.deserialize(
                        bytearray(zf.read(f"fn_b{n}.jaxexport"))
                    )
            self._state0 = (
                _decode_weights(zf.read("state.npz"))
                if meta.get("stateful") else None
            )

        # sharded artifact: rebuild an equally-shaped mesh from local
        # devices and place weights/inputs by the recorded PartitionSpecs
        self.mesh = None
        self._w_shardings = None
        self._batch_sharding = None
        if meta.get("mesh"):
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from pyopenvino_tpu.parallel.mesh import put_global

            m = meta["mesh"]
            n_dev = int(m["num_devices"])
            devices = jax.devices()
            if len(devices) < n_dev:
                raise ValueError(
                    f"sharded artifact needs {n_dev} devices "
                    f"(mesh {m['axis_names']}={m['shape']}), "
                    f"have {len(devices)}"
                )
            self.mesh = Mesh(
                np.array(devices[:n_dev]).reshape(m["shape"]),
                tuple(m["axis_names"]),
            )
            self._w_shardings = {
                k: NamedSharding(self.mesh, P(*spec))
                for k, spec in meta["w_pspecs"].items()
            }
            self._batch_sharding = NamedSharding(
                self.mesh, P(*meta["batch_pspec"])
            )
            weights = {
                k: put_global(v, self._w_shardings[k])
                for k, v in weights.items()
            }
            self.weights = weights
        else:
            self.weights = {
                k: jax.numpy.asarray(v) for k, v in weights.items()
            }
        self.input_names = list(meta["inputs"])
        self.output_names = list(meta["outputs"])
        self._in_shapes = {
            k: tuple(v["shape"]) for k, v in meta["inputs"].items()
        }
        self._in_dtypes = {
            k: np.dtype(v["dtype"]) for k, v in meta["inputs"].items()
        }
        if self._state0 is not None:
            # donated state: XLA aliases new_state onto the input buffers,
            # same zero-allocation step as CompiledNetwork (_build_fn)
            self._call_b1 = jax.jit(self._exp_b1.call, donate_argnums=(2,))
            self.state = None
        else:
            self._call_b1 = jax.jit(self._exp_b1.call)
        self._call_batched = (
            jax.jit(self._exp_batched.call) if self._exp_batched else None
        )
        self._call_buckets = {
            n: jax.jit(e.call) for n, e in self._exp_buckets.items()
        }

    # -- variable state (stateful artifacts) ---------------------------------

    @property
    def stateful(self) -> bool:
        return self._state0 is not None

    def reset_state(self):
        """(Re-)initialize every variable from the artifact's serialized
        initial state (init subgraph values + fresh flags)."""
        import jax.numpy as jnp

        self.state = {k: jnp.asarray(v) for k, v in self._state0.items()}

    def query_state(self) -> Dict[str, np.ndarray]:
        """{variable_id: host array} of the current state (fresh flags
        elided) — OpenVINO query_state over an imported artifact."""
        if self.state is None:
            self.reset_state()
        return {
            vid: np.asarray(self.state[vid])
            for vid in self.meta.get("variables", {})
        }

    def _prep(self, inputs, batched: bool):
        prepped = {}
        for name in self.input_names:
            if name not in inputs:
                raise KeyError(f"missing input {name!r}")
            shape = self._in_shapes[name]
            if batched:
                arr = np.asarray(inputs[name])
                shape = (arr.shape[0],) + shape[1:]
            prepped[name] = (
                np.asarray(inputs[name])
                .reshape(shape)
                .astype(self._in_dtypes[name], copy=False)
            )
        return prepped

    def __call__(self, inputs):
        if self._state0 is not None:
            if self.state is None:
                self.reset_state()
            out, self.state = self._call_b1(
                self.weights, self._prep(inputs, batched=False), self.state
            )
        else:
            out = self._call_b1(
                self.weights, self._prep(inputs, batched=False)
            )
        return {k: np.asarray(v) for k, v in out.items()}

    def infer(self, inputs, verbose: bool = False):
        import time

        t0 = time.perf_counter()
        out = self(inputs)
        if verbose:
            print(f"@TOTAL_TIME, {time.perf_counter() - t0}")
        return out

    def infer_batch(self, inputs):
        if self._state0 is not None:
            raise NotImplementedError(
                "stateful artifacts run at their declared shapes — bake "
                "the batch into the IR before export (IENetwork.reshape)"
            )
        prepped = self._prep(inputs, batched=True)
        b = next(iter(prepped.values())).shape[0]
        if self._call_batched is not None:
            call = self._call_batched
        elif b in self._call_buckets:
            call = self._call_buckets[b]
        else:
            raise ValueError(
                f"batch {b} not in the artifact's fixed buckets "
                f"{sorted(self._call_buckets)} (exported without "
                f"shape polymorphism)"
            )
        if self._batch_sharding is not None:
            from pyopenvino_tpu.parallel.mesh import put_global

            prepped = {
                k: put_global(v, self._batch_sharding)
                for k, v in prepped.items()
            }
        out = call(self.weights, prepped)
        return {k: np.asarray(v) for k, v in out.items()}


def import_compiled(path: str) -> ImportedNetwork:
    return ImportedNetwork(path)
