"""OpenVINO-compatible facade — the drop-in API layer.

Mirrors the reference's user-facing surface (reference:
pyopenvino/inference_engine.py:47-321):

    ie = IECore()
    net = ie.read_network(xml, bin)        # → IENetwork
    exenet = ie.load_network(net, 'TPU')   # → ExecutableNetwork
    exenet.kernel_type = 'special'         # naive/numpy/special still accepted
    res = exenet.infer({input_name: blob}) # {result_node_name: ndarray}

Inputs bind by Parameter node name, outputs key by Result node name, exactly
like the reference (inference_engine.py:300-303,313-319).  The reference's
kernel_type strings map onto typed backends (config.py): naive/numpy → the
numpy interpreter, special → the XLA-compiled TPU path.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from pyopenvino_tpu.config import KERNEL_TYPE_TO_BACKEND, Backend, Config, QuantMode
from pyopenvino_tpu.ir import Model, read_ir_model
from pyopenvino_tpu.ops import supported_ops
from pyopenvino_tpu.runtime.interpreter import Interpreter


class IENetwork:
    """Thin wrapper over the typed Model with the reference's net.inputs /
    net.outputs conveniences (inference_engine.py:79-81)."""

    def __init__(self, model: Model):
        self.model = model
        self.name = model.name
        self.inputs = [
            {"id": n.id, "name": n.name, "shape": n.outputs[n.out_port].shape}
            for n in model.parameters
        ]
        self.outputs = [
            {"id": n.id, "name": n.name, "shape": n.inputs[0].shape}
            for n in model.results
        ]

    @property
    def input_info(self) -> Dict[str, dict]:
        return {i["name"]: i for i in self.inputs}

    def reshape(self, new_shapes: Dict[str, tuple]):
        """Change input shapes before load_network — OpenVINO's
        ``IENetwork.reshape`` (absent from the reference; its shapes are
        frozen into the XML).  Shape inference re-derives every port;
        ops that capture the old shape (fixed Reshape flatten targets,
        PriorBox anchors) raise their own shape error, matching the
        real engine's contract."""
        from pyopenvino_tpu.passes.shape_infer import reshape_model

        self.__init__(reshape_model(self.model, new_shapes))
        return self


class ExecutableNetwork:
    """A loaded network with a selectable backend.

    Compilation is lazy per backend: setting ``kernel_type``/``backend``
    switches which engine ``infer`` uses.  Debug hooks (expected_result,
    capture_node_args) ride on the interpreter backend like the reference's
    (inference_engine.py:214-216).
    """

    def __init__(self, network: IENetwork, config: Config):
        self.ienet = network
        self.config = config
        self._interpreter: Optional[Interpreter] = None
        self._compiled = {}
        self.expected_result = None
        self.capture_node_args = []
        self.num_requests = 1
        self.last_compare_failures = []
        self._server = None
        self._requests = None
        self._calibration = None

    # reference-compatible knob (inference_engine.py:215)
    @property
    def kernel_type(self) -> str:
        return self.config.backend.value

    @kernel_type.setter
    def kernel_type(self, value: str):
        if value not in KERNEL_TYPE_TO_BACKEND:
            raise ValueError(
                f"unknown kernel_type {value!r}; "
                f"accepted: {sorted(KERNEL_TYPE_TO_BACKEND)}"
            )
        self.config = self.config.replace(backend=KERNEL_TYPE_TO_BACKEND[value])

    @property
    def backend(self) -> Backend:
        return self.config.backend

    def _get_interpreter(self) -> Interpreter:
        if self._interpreter is None:
            self._interpreter = Interpreter(self.ienet.model)
        it = self._interpreter
        it.expected_result = self.expected_result
        it.capture_node_args = self.capture_node_args
        return it

    def set_calibration(self, samples):
        """Representative {input_name: blob} dicts for INT8_FULL activation
        calibration (passes/calibrate.py)."""
        self._calibration = list(samples)
        self._compiled.clear()  # scales change the compiled program
        self.close()  # a running async-request server is stale too

    def _get_compiled(self):
        # key on the FULL config: a mutation of any field (e.g.
        # calibration_percentile, int8_dataflow, depthwise_mode) must
        # trigger a recompile, not return a stale cached program
        import dataclasses

        key = dataclasses.astuple(self.config)
        if key not in self._compiled:
            from pyopenvino_tpu.runtime.compiler import compile_model

            self._compiled[key] = compile_model(
                self.ienet.model,
                self.config,
                calibration_samples=self._calibration,
            )
        return self._compiled[key]

    def infer(
        self, inputs: Dict[str, np.ndarray], verbose: bool = False
    ) -> Dict[str, np.ndarray]:
        if self.config.backend == Backend.INTERPRETER:
            it = self._get_interpreter()
            out = it.run(inputs, verbose=verbose)
            self.last_compare_failures = list(
                getattr(it, "last_compare_failures", [])
            )
            return out
        compiled = self._get_compiled()
        if self.expected_result:
            # golden feature-map comparison on the compiled path too
            # (reference hook: inference_engine.py:214,284-287).  One
            # device execution: the capture variant returns the final
            # results alongside the named activations.
            out, acts = compiled.infer_with_capture(
                inputs, list(self.expected_result)
            )
            from pyopenvino_tpu.utils.compare import compare_golden

            self.last_compare_failures = []
            for name, want in self.expected_result.items():
                if name not in acts:
                    continue  # constant-folded / fused away
                if not compare_golden(name, acts[name], want, rtol=1.0,
                                      verbose=verbose):
                    self.last_compare_failures.append(name)
            return out
        return compiled.infer(inputs, verbose=verbose)

    def infer_batch(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.config.backend == Backend.INTERPRETER:
            # honor the selected backend (e.g. kernel_type='numpy' to stay
            # off the device): run the numpy twin per example and stack
            it = self._get_interpreter()
            n = next(iter(inputs.values())).shape[0]
            declared = {
                p.name: p.outputs[p.out_port].shape
                for p in self.ienet.model.parameters
            }
            # same contract as the compiled path (runtime/compiler.py
            # batched_fn): per-example rows reshape to the declared input
            # shape; outputs collapse the declared unit batch dim
            per = [
                it.run({
                    k: np.asarray(v[i]).reshape(declared[k])
                    for k, v in inputs.items()
                })
                for i in range(n)
            ]
            return {
                k: np.stack([p[k][0] for p in per], axis=0)
                for k in per[0]
            }
        return self._get_compiled().infer_batch(inputs)

    def get_perf_counts(self, inputs=None) -> Dict[str, dict]:
        """Per-layer performance counters — OpenVINO's
        ``InferRequest.get_perf_counters`` surface; the reference prints the
        same numbers from its dispatch loop (inference_engine.py:273-283).

        Returns {layer_name: {status, layer_type, exec_type, real_time_us}}.
        Interpreter backend: the measured per-node wall-clock of the LAST
        ``infer``.  Compiled backends: one measured ``jax.profiler`` pass
        over ``inputs`` (required) — per-node device time attributed via
        the emission named scopes (fusion-approximate,
        runtime/profiling.py); layers folded at compile time or absorbed
        into a fused epilogue report status NOT_RUN, like OpenVINO's
        optimized-out layers.  Needs a TPU device plane; the numpy twin is
        the off-device profile (``kernel_type='numpy'`` + infer)."""
        if self.config.backend == Backend.INTERPRETER:
            it = self._get_interpreter()
            if not it.last_timings:
                raise RuntimeError(
                    "no interpreter run recorded — call infer() first"
                )
            return {
                name: {
                    "status": "EXECUTED",
                    "layer_type": op_type,
                    "exec_type": "numpy_ref",
                    "real_time_us": round(dt * 1e6, 2),
                }
                for _, op_type, name, dt in it.last_timings
            }
        if inputs is None:
            raise ValueError(
                "compiled-path perf counts profile a real execution — "
                "pass inputs"
            )
        from pyopenvino_tpu.runtime import profiling

        compiled = self._get_compiled()
        rows = compiled.profile(inputs)
        if not rows:
            # hlo_stats has no device plane off-TPU — an empty profile
            # must not masquerade as "every layer NOT_RUN"
            raise RuntimeError(
                "device profile came back empty (no TPU device plane?) — "
                "use kernel_type='numpy' + infer() for host-side counts"
            )
        agg = profiling.aggregate(rows, by="node")
        by_id = {}
        for row in agg:
            scope = row["node"]
            if "_" in scope and scope.rsplit("_", 1)[1].isdigit():
                by_id[int(scope.rsplit("_", 1)[1])] = row
        out = {}
        for node in self.ienet.model:
            if node.op_type in ("Const", "Parameter", "Result"):
                continue
            row = by_id.get(node.id)
            if row is None:
                out[node.name] = {
                    "status": "NOT_RUN",  # folded / fused into a neighbor
                    "layer_type": node.op_type,
                    "exec_type": "",
                    "real_time_us": 0.0,
                }
            else:
                out[node.name] = {
                    "status": "EXECUTED",
                    "layer_type": node.op_type,
                    "exec_type": row.get("bound_by") or "device",
                    "real_time_us": row["self_us"],
                }
        return out

    # -- async request API (OpenVINO ExecutableNetwork.requests parity) ------
    # The reference accepts num_requests and ignores it
    # (inference_engine.py:86); real OpenVINO exposes a pool of InferRequest
    # objects with start_async/wait.  Here the pool is backed by the
    # continuous-batching server, so concurrent async requests coalesce
    # into shared device launches.

    @property
    def requests(self):
        if self._requests is None:
            n = max(1, self.num_requests)
            if not self.stateful:  # stateful requests run inline, no server
                self._ensure_server()
            self._requests = [InferRequest(self) for _ in range(n)]
        return self._requests

    def _ensure_server(self):
        # the server binds one compiled program; recreate it whenever the
        # effective config produced a different compile (kernel_type /
        # config mutation after first use must not serve stale programs)
        compiled = self._get_compiled()
        if self._server is not None and self._server.compiled is not compiled:
            self.close()
        if self._server is None:
            from pyopenvino_tpu.serving import InferenceServer

            # warmup=True: pre-compile every batch bucket so the first
            # async request in a cold bucket doesn't pay the jit compile
            # inside its latency (serving/server.py start docstring).
            self._server = InferenceServer(
                compiled, buckets=self.config.batch_buckets
            ).start(warmup=True)
        return self._server

    # -- variable state (OpenVINO VariableState parity — ops/state_ops.py) --

    def _state_holder(self):
        """The backend object carrying variable state for this config."""
        if self.config.backend == Backend.INTERPRETER:
            return self._get_interpreter()
        return self._get_compiled()

    @property
    def stateful(self) -> bool:
        return bool(self.ienet.model.find_by_type("ReadValue"))

    def query_state(self) -> list:
        """List of VariableState, one per ReadValue variable — the
        OpenVINO 2.0 ``InferRequest.query_state()`` surface."""
        holder = self._state_holder()
        return [VariableState(holder, vid)
                for vid in sorted(holder.query_state())]

    def reset_state(self):
        """Reset every variable to its init subgraph value."""
        self._state_holder().reset_state()

    def close(self):
        """Stop the async-request server, if one was started."""
        srv = self._server
        if srv is not None:
            srv.stop()
            self._server = None
            self._requests = None

    def shard(self, mesh=None, tensor_parallel: bool = False,
              spatial_parallel: bool = False, data: int = 0,
              model: int = 1, spatial: int = 1):
        """Place this network on a device mesh (parallel/mesh.py
        shard_compiled).  Pass a prebuilt ``jax.sharding.Mesh`` or axis
        sizes (``data`` defaults to all remaining devices).  Returns
        self; subsequent ``infer_batch`` calls run sharded.

            exe.shard(model=2, tensor_parallel=True)   # DP×TP
            exe.shard(spatial=4, spatial_parallel=True) # DP×SP
        """
        import jax

        from pyopenvino_tpu.parallel.mesh import (
            MeshConfig, build_mesh, shard_compiled,
        )

        if mesh is None:
            n = len(jax.devices())
            d = data or max(1, n // (model * spatial))
            mesh = build_mesh(MeshConfig(data=d, model=model,
                                         spatial=spatial))
        shard_compiled(self._get_compiled(), mesh,
                       tensor_parallel=tensor_parallel,
                       spatial_parallel=spatial_parallel)
        return self

    def export(self, path: str, buckets=(8, 32)) -> None:
        """OpenVINO ``ExecutableNetwork.export`` parity: serialize the
        compiled program (StableHLO via ``jax.export``) + processed weights
        into one artifact loadable by ``IECore.import_network`` without the
        IR files (runtime/export.py)."""
        if self.config.backend == Backend.INTERPRETER:
            raise ValueError(
                "the interpreter backend has no compiled program to export; "
                "use kernel_type 'xla'/'special'"
            )
        self._get_compiled().export(path, buckets=buckets)


class VariableState:
    """One ReadValue/Assign variable — OpenVINO ``VariableState`` parity
    (``.name``, ``.state`` get/set, ``.reset()``).  Backed by whichever
    executor holds the state (Interpreter dict / CompiledNetwork donated
    device pytree / a request's private _StatefulStream —
    ops/state_ops.py module docstring)."""

    def __init__(self, holder, name: str):
        self._holder = holder
        self.name = name

    @property
    def state(self) -> np.ndarray:
        return self._holder.query_state()[self.name]

    @state.setter
    def state(self, value):
        self._holder.set_state({self.name: value})

    def reset(self):
        """Reset THIS variable to its init value (others untouched) — a
        dynamic (input-dependent) init subgraph is recomputed at the next
        infer, like OpenVINO's reset-to-init semantics."""
        self._holder.reset_variable(self.name)

    def __repr__(self):
        return f"VariableState({self.name!r})"


class _StatefulStream:
    """Per-request variable state — OpenVINO scopes state per InferRequest
    (``query_state`` is a request method), so every InferRequest on a
    stateful network owns one of these.  Compiled backends thread a
    PRIVATE donated state pytree through ``CompiledNetwork.step``;
    concurrent requests therefore never share (or double-donate) state
    buffers.  The interpreter backend gets a private Interpreter twin."""

    def __init__(self, exe: "ExecutableNetwork"):
        self._exe = exe
        self._interp: Optional[Interpreter] = None
        self._state = None     # compiled-path device pytree
        self._compiled = None  # the compile the pytree belongs to

    def _backend(self):
        """(interpreter, compiled): exactly one is non-None; the state
        pytree is re-created whenever a config change produced a new
        compiled program."""
        if self._exe.config.backend == Backend.INTERPRETER:
            if self._interp is None:
                self._interp = Interpreter(self._exe.ienet.model)
            return self._interp, None
        compiled = self._exe._get_compiled()
        if self._compiled is not compiled or self._state is None:
            self._compiled = compiled
            self._state = compiled.fresh_state()
        return None, compiled

    def infer(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        interp, compiled = self._backend()
        if interp is not None:
            return interp.run(inputs)
        out, self._state = compiled.step(inputs, self._state)
        return out

    def query_state(self) -> Dict[str, np.ndarray]:
        interp, compiled = self._backend()
        if interp is not None:
            return interp.query_state()
        return compiled.state_to_host(self._state)

    def set_state(self, values: Dict[str, np.ndarray]):
        interp, compiled = self._backend()
        if interp is not None:
            interp.set_state(values)
        else:
            self._state = compiled.state_with(self._state, values)

    def reset_state(self):
        interp, compiled = self._backend()
        if interp is not None:
            interp.reset_state()
        else:
            self._state = compiled.fresh_state()

    def reset_variable(self, vid: str):
        interp, compiled = self._backend()
        if interp is not None:
            interp.reset_variable(vid)
        else:
            self._state = compiled.state_with_reset(self._state, vid)


class InferRequest:
    """One slot of the async request pool (OpenVINO InferRequest parity:
    start_async → wait → output_blobs).  Requests submitted concurrently
    from multiple slots coalesce in the serving layer's batch scheduler.

    Stateful networks (ReadValue/Assign) bypass the coalescing server —
    steps within ONE request are sequential by definition (each reads the
    previous step's Assign), so start_async runs the step inline against
    the request's PRIVATE variable state (_StatefulStream; OpenVINO scopes
    state per request) and wait() is immediate.  Note the deviation on the
    legacy surface: ``ExecutableNetwork.infer`` keeps its own network-level
    implicit stream, independent of every request's."""

    def __init__(self, exe: "ExecutableNetwork"):
        self._exe = exe
        self._future = None
        self.output_blobs: Dict[str, np.ndarray] = {}
        self._stream = _StatefulStream(exe) if exe.stateful else None

    def infer(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        self.start_async(inputs)
        self.wait()
        return self.output_blobs

    def start_async(self, inputs: Dict[str, np.ndarray]):
        if self._future is not None and not self._future.done():
            raise RuntimeError("request is already running; wait() first")
        if self._stream is not None:
            import concurrent.futures

            f = concurrent.futures.Future()
            try:
                f.set_result(self._stream.infer(inputs))
            except Exception as e:  # surfaced by wait(), like server jobs
                f.set_exception(e)
            self._future = f
            return self
        self._future = self._exe._ensure_server().submit(inputs)
        return self

    def query_state(self) -> list:
        """OpenVINO 2.0 ``InferRequest.query_state()`` — VariableState per
        ReadValue variable, backed by THIS request's private state."""
        if self._stream is not None:
            return [
                VariableState(self._stream, vid)
                for vid in sorted(self._stream.query_state())
            ]
        return self._exe.query_state()

    def reset_state(self):
        if self._stream is not None:
            self._stream.reset_state()
        else:
            self._exe.reset_state()

    def wait(self, timeout: Optional[float] = None) -> int:
        if self._future is None:
            return 0
        self.output_blobs = self._future.result(timeout=timeout)
        return 0  # OK status, like openvino's StatusCode.OK

    def get_perf_counts(self, inputs=None) -> Dict[str, dict]:
        """OpenVINO InferRequest.get_perf_counters parity — see
        ExecutableNetwork.get_perf_counts."""
        return self._exe.get_perf_counts(inputs)


class AsyncInferQueue:
    """OpenVINO 2.0 ``AsyncInferQueue`` parity: a pool of ``jobs`` async
    infer slots with a user completion callback.

        queue = AsyncInferQueue(compiled, jobs=4)
        queue.set_callback(lambda request, userdata: ...)
        for i, blob in enumerate(dataset):
            queue.start_async({"data": blob}, userdata=i)   # blocks when full
        queue.wait_all()

    Requests submitted from different slots coalesce in the continuous-
    batching server into shared device launches (serving/server.py) — the
    TPU-native realization of OpenVINO's throughput-mode request pipeline.
    """

    def __init__(self, compiled_model, jobs: int = 4):
        import queue as _queue
        import threading

        exe = getattr(compiled_model, "_exe", compiled_model)
        if not isinstance(exe, ExecutableNetwork):
            raise TypeError(
                "AsyncInferQueue takes a CompiledModel or ExecutableNetwork"
            )
        self._exe = exe
        self._requests = [InferRequest(exe) for _ in range(max(1, jobs))]
        self._idle = _queue.SimpleQueue()
        for i in range(len(self._requests)):
            self._idle.put(i)
        self._callback = None
        self._inflight = 0
        self._lock = threading.Lock()
        self._all_done = threading.Condition(self._lock)
        self._errors: list = []

    def __len__(self) -> int:
        return len(self._requests)

    def __getitem__(self, i: int) -> InferRequest:
        return self._requests[i]

    def __iter__(self):
        return iter(self._requests)

    def set_callback(self, callback):
        """callback(request: InferRequest, userdata) — runs when a job
        completes, with ``request.output_blobs`` already populated."""
        self._callback = callback

    def is_ready(self) -> bool:
        """True when a slot is idle (start_async would not block)."""
        return not self._idle.empty()

    def start_async(self, inputs: Dict[str, np.ndarray], userdata=None):
        """Submit one inference; blocks until a slot is free (OpenVINO
        semantics)."""
        idx = self._idle.get()  # blocks when all jobs are in flight
        req = self._requests[idx]
        with self._lock:
            self._inflight += 1
        if req._stream is not None:
            # stateful: run inline on the slot's PRIVATE state stream
            # (never through the coalescing server — variable state is
            # per-request, and batched stateful coalescing is undefined)
            try:
                req.output_blobs = req._stream.infer(inputs)
                if self._callback is not None:
                    self._callback(req, userdata)
            except Exception as e:  # surfaced by wait_all
                with self._lock:
                    self._errors.append(e)
            finally:
                self._idle.put(idx)
                with self._all_done:
                    self._inflight -= 1
                    if self._inflight == 0:
                        self._all_done.notify_all()
            return
        try:
            # submit-time validation raises HERE (synchronously), like
            # OpenVINO's start_async on malformed blobs — the slot must
            # return to the pool on that path
            fut = self._exe._ensure_server().submit(inputs)
        except Exception:
            self._idle.put(idx)
            with self._all_done:
                self._inflight -= 1
                if self._inflight == 0:
                    self._all_done.notify_all()
            raise
        req._future = fut

        def _done(f, idx=idx, req=req, userdata=userdata):
            try:
                req.output_blobs = f.result()
                if self._callback is not None:
                    self._callback(req, userdata)
            except Exception as e:  # surfaced by wait_all
                with self._lock:
                    self._errors.append(e)
            finally:
                self._idle.put(idx)
                with self._all_done:
                    self._inflight -= 1
                    if self._inflight == 0:
                        self._all_done.notify_all()

        fut.add_done_callback(_done)

    def wait_all(self, timeout: Optional[float] = None):
        """Block until every submitted job has completed; re-raises the
        first inference/callback error."""
        with self._all_done:
            if not self._all_done.wait_for(
                lambda: self._inflight == 0, timeout=timeout
            ):
                raise TimeoutError(
                    f"{self._inflight} job(s) still in flight"
                )
            if self._errors:
                raise self._errors[0]


class IECore:
    def __init__(self):
        self.supported = set(supported_ops())

    def set_config(self, config: Dict[str, object], device_name: str = "TPU"):
        """OpenVINO 1.0 ``ie.set_config`` — supported keys: ``CACHE_DIR``
        (persistent compiled-program cache, runtime/cache.py).  Unknown
        keys fail fast rather than being silently dropped."""
        for key, value in config.items():
            if key == "CACHE_DIR":
                from pyopenvino_tpu.runtime.cache import (
                    disable_model_cache, enable_model_cache,
                )

                if value:
                    enable_model_cache(str(value))
                else:
                    disable_model_cache()
            else:
                raise ValueError(f"unsupported config key {key!r}")

    def get_config(self, device_name: str = "TPU", name: str = "CACHE_DIR"):
        """OpenVINO 1.0 ``ie.get_config`` — reads back the supported keys
        (today: ``CACHE_DIR``; empty string when the cache is off)."""
        if name == "CACHE_DIR":
            from pyopenvino_tpu.runtime.cache import current_cache_dir

            return current_cache_dir() or ""
        raise ValueError(f"unsupported config key {name!r}")

    def get_metric(self, device_name: str = "TPU", name: str = ""):
        """OpenVINO 1.0 ``ie.get_metric`` subset: the device-introspection
        keys deployment scripts read."""
        import jax

        if name == "AVAILABLE_DEVICES":
            return [str(i) for i in range(len(jax.devices()))]
        if name == "FULL_DEVICE_NAME":
            d = jax.devices()[0]
            return f"{d.platform.upper()}:{getattr(d, 'device_kind', '')}"
        if name == "SUPPORTED_METRICS":
            return ["AVAILABLE_DEVICES", "FULL_DEVICE_NAME",
                    "SUPPORTED_METRICS"]
        raise ValueError(f"unsupported metric {name!r}")

    def read_network(self, model: str, weights: Optional[str] = None) -> IENetwork:
        # NOTE: unlike the reference, `weights` is honoured
        # (inference_engine.py:105-110 ignores it).
        return IENetwork(read_ir_model(model, weights))

    def check_nodes(self, network: IENetwork):
        """Fail-fast unsupported-op check (the reference warns and later
        sys.exit()s mid-run — inference_engine.py:62-71,270-272)."""
        unsupported = {
            n.op_type
            for n in network.model.nodes.values()
            if n.op_type not in self.supported
        }
        if unsupported:
            raise ValueError(f"unsupported node types: {sorted(unsupported)}")

    def query_network(
        self, network: IENetwork, device_name: str = "TPU"
    ) -> Dict[str, str]:
        """OpenVINO IECore.query_network parity: {layer_name: device} for
        every layer the device supports (unsupported layers are omitted —
        callers diff against the network's layer list, exactly how
        OpenVINO's QueryNetworkResult.supportedLayersMap is consumed).
        The reference's closest surface is the warn-only check_nodes
        (inference_engine.py:62-71)."""
        return {
            n.name: device_name
            for n in network.model.nodes.values()
            if n.op_type in self.supported
        }

    def import_network(self, path: str, device_name: str = "TPU"):
        """OpenVINO ``IECore.import_network`` parity: load a compiled
        artifact produced by ``ExecutableNetwork.export`` and run it
        without the original .xml/.bin (runtime/export.py — the exported
        StableHLO compiles for whatever backend this process runs on;
        ``device_name`` is accepted for signature parity)."""
        from pyopenvino_tpu.runtime.export import import_compiled

        return import_compiled(path)

    def load_network(
        self,
        network: IENetwork,
        device_name: str = "TPU",
        num_requests: int = 1,
        config: Optional[Config] = None,
    ) -> ExecutableNetwork:
        self.check_nodes(network)
        cfg = config or Config()
        if device_name.upper() in ("CPU", "INTERPRETER"):
            cfg = cfg.replace(backend=Backend.INTERPRETER)
        exe = ExecutableNetwork(network, cfg)
        exe.num_requests = num_requests  # sizes the async request pool
        return exe


class CompiledModel:
    """OpenVINO 2.0-API handle over an ExecutableNetwork: callable,
    plus create_infer_request() for the async workflow."""

    def __init__(self, exe: ExecutableNetwork):
        self._exe = exe

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return self._exe.infer(inputs)

    def infer_new_request(
        self, inputs: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        return self._exe.infer(inputs)

    def create_infer_request(self) -> InferRequest:
        return InferRequest(self._exe)

    def export_model(self, path: str, buckets=(8, 32)) -> None:
        """OpenVINO 2.0 ``CompiledModel.export_model`` parity — see
        ExecutableNetwork.export."""
        self._exe.export(path, buckets=buckets)

    @property
    def inputs(self):
        return self._exe.ienet.inputs

    @property
    def outputs(self):
        return self._exe.ienet.outputs


class Core:
    """The OpenVINO 2.0 entry point (`openvino.Core`), mapped onto the
    same engine the 1.0-style IECore drives.  The reference implements
    only the legacy API (inference_engine.py IECore/IENetwork); users
    coming from current OpenVINO get the modern spelling here:

        core = Core()
        model = core.read_model("net.xml")          # has .reshape()
        compiled = core.compile_model(model, "TPU")
        out = compiled({"data": blob})              # or infer requests
    """

    def __init__(self):
        self._ie = IECore()

    def read_model(self, model: str,
                   weights: Optional[str] = None) -> IENetwork:
        return self._ie.read_network(model, weights)

    def set_property(self, properties: Dict[str, object]):
        """OpenVINO 2.0 ``core.set_property`` — supported keys:
        ``CACHE_DIR`` (persistent compiled-program cache,
        runtime/cache.py)."""
        self._ie.set_config(properties)

    def get_property(self, device_name: str = "TPU",
                     name: str = "CACHE_DIR"):
        """OpenVINO 2.0 ``core.get_property`` — config keys read back via
        get_config, device metrics via get_metric."""
        try:
            return self._ie.get_config(device_name, name)
        except ValueError:
            return self._ie.get_metric(device_name, name)

    def compile_model(
        self,
        model: IENetwork,
        device_name: str = "TPU",
        config=None,
    ) -> CompiledModel:
        """``config`` accepts a Config dataclass or the OpenVINO-style
        properties dict ({"CACHE_DIR": path, ...})."""
        if isinstance(config, dict):
            self.set_property(config)
            config = None
        return CompiledModel(
            self._ie.load_network(model, device_name, config=config))

    def import_model(self, path: str, device_name: str = "TPU"):
        """OpenVINO 2.0 ``Core.import_model`` parity — see
        IECore.import_network."""
        return self._ie.import_network(path, device_name)
