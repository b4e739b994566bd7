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

Scope: single-device programs.  A mesh-sharded network re-shards at load
time instead (``shard_compiled`` on the importing side) — serialized
shardings would pin the artifact to one mesh topology.
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

    if compiled.mesh is not None:
        raise ValueError(
            "export_compiled serializes single-device programs; export the "
            "unsharded network and shard_compiled() after import instead"
        )
    if compiled.variables:
        raise NotImplementedError(
            "export of stateful networks (ReadValue/Assign) is not "
            "supported yet — the state pytree argument is not part of the "
            ".ovtpu artifact schema; compile from the IR instead"
        )

    weights = compiled.weights
    w_spec = _weights_spec(weights)
    param_infos = {
        n.name: n.outputs[n.out_port] for n in compiled.model.parameters
    }
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

    cfg = dataclasses.asdict(compiled.config)
    cfg["backend"] = compiled.config.backend.value
    cfg["quant"] = compiled.config.quant.value
    meta = {
        "format_version": _FORMAT_VERSION,
        "config": cfg,
        "platforms": list(used_platforms),
        "batched_mode": batched_mode,
        "buckets": fixed,
        "inputs": {
            name: {
                "shape": [int(d) for d in info.shape],
                "dtype": np.dtype(info.dtype).name,
            }
            for name, info in param_infos.items()
        },
        "outputs": [n.name for n in compiled.model.results],
    }

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("weights.npz", _encode_weights(weights))
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

        self.weights = {k: jax.numpy.asarray(v) for k, v in weights.items()}
        self.input_names = list(meta["inputs"])
        self.output_names = list(meta["outputs"])
        self._in_shapes = {
            k: tuple(v["shape"]) for k, v in meta["inputs"].items()
        }
        self._in_dtypes = {
            k: np.dtype(v["dtype"]) for k, v in meta["inputs"].items()
        }
        self._call_b1 = jax.jit(self._exp_b1.call)
        self._call_batched = (
            jax.jit(self._exp_batched.call) if self._exp_batched else None
        )
        self._call_buckets = {
            n: jax.jit(e.call) for n, e in self._exp_buckets.items()
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
        out = self._call_b1(self.weights, self._prep(inputs, batched=False))
        return {k: np.asarray(v) for k, v in out.items()}

    def infer(self, inputs, verbose: bool = False):
        import time

        t0 = time.perf_counter()
        out = self(inputs)
        if verbose:
            print(f"@TOTAL_TIME, {time.perf_counter() - t0}")
        return out

    def infer_batch(self, inputs):
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
        out = call(self.weights, prepped)
        return {k: np.asarray(v) for k, v in out.items()}


def import_compiled(path: str) -> ImportedNetwork:
    return ImportedNetwork(path)
