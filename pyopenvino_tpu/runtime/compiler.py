"""Graph compiler: typed IR → one traced JAX function → XLA executable.

This replaces the reference's "compilation" step — a topological sort feeding
a per-layer Python dispatch loop (reference: inference_engine.py:218-292) —
with real compilation: the whole graph is emitted (in exactly that
topological order) into a single JAX function, jit-compiled by XLA onto the
MXU/VPU.  Per-layer Python dispatch overhead, the reference's dominant cost
profile (SURVEY.md §3.4), disappears entirely.

Key compile-time behaviors:
  * constant folding — every statically-known subgraph (ShapeOf →
    StridedSlice → PriorBoxClustered → Concat chains in SSD, SURVEY.md §3.5)
    is evaluated by the shape-analysis value propagation and never traced;
  * weights are function *arguments* (a {const_id: array} pytree), not baked
    literals, so they can be device-placed, sharded over a mesh, or swapped
    (INT8 weight-only quantization stores int8 + per-channel scales);
  * batch-N is `jax.vmap` over the batch=1 graph — the idiomatic JAX answer
    to the reference's hardcoded batch=1 (Convolution.py:112-113);
  * one jit cache entry per batch bucket avoids recompile thrash in serving.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from pyopenvino_tpu.config import Config, QuantMode
from pyopenvino_tpu.ir.model import Model
from pyopenvino_tpu.ops import get_op
from pyopenvino_tpu.ops.spec import TValue
from pyopenvino_tpu.passes.shape_infer import ShapeAnalysis, infer_shapes

# (op_type, input_port) pairs consumed at compile time — never traced.
STATIC_PORTS = {
    ("Reshape", 1),
    ("Transpose", 1),
    ("Unsqueeze", 1),
    ("StridedSlice", 1),
    ("StridedSlice", 2),
    ("StridedSlice", 3),
    ("PriorBoxClustered", 0),
    ("PriorBoxClustered", 1),
    ("LRN", 1),  # axes input, ignored (reference: LRN.py:67)
    # variable init value: consumed at state-reset time (ops/state_ops.py
    # initial_state), never traced — the traced read comes from the state
    # pytree argument
    ("ReadValue", 0),
}

# Constants larger than this stay runtime weight params even when their value
# is statically known; smaller folded values are inlined as literals.
_INLINE_LIMIT = 1 << 16

# State-pytree key suffix for the per-variable "fresh" flag carried for
# dynamic-init variables: where(fresh, traced_init, state) in _build_fn
# reproduces the interpreter's first-infer initialization of an
# input-dependent ReadValue init subgraph (ops/state_ops.py).
_FRESH = "::fresh"


class EmitCtx:
    """Trace-time services handed to every op's ``emit``."""

    def __init__(
        self,
        model: Model,
        analysis: ShapeAnalysis,
        config: Config,
        act_scales: Optional[Dict[int, float]] = None,
        int8_edges: Optional[Dict[Tuple[int, int], float]] = None,
    ):
        self.model = model
        self.analysis = analysis
        self.config = config
        self.act_scales = act_scales or {}
        # {(src, sport): scale} INT8-FULL storage decisions — lets an op
        # requantize its OWN output in-kernel (Pallas LRN) instead of
        # relying on the compiler's post-emit store() quantize.
        self.int8_edges = int8_edges or {}
        # Device weight pytree, set by _build_fn at trace time so subgraph
        # ops (ops/subgraph.py) can resolve their body Const weights from
        # the same pytree ("sub.<node>.<body>.<const>" keys); empty for
        # contexts built outside the compiler (nested body EmitCtx gets the
        # outer pytree + prefix assigned by _emit_graph).
        self.weights: Dict[str, object] = {}
        self.weight_prefix: str = ""

    def out_int8_scale(self, node) -> Optional[float]:
        """Storage scale if this node's output edge is int8-stored."""
        return self.int8_edges.get((node.id, node.out_port))

    @property
    def full_int8(self) -> bool:
        return self.config.quant == QuantMode.INT8_FULL

    def act_scale(self, node) -> Optional[float]:
        """Calibrated per-tensor scale for this node's data input, if any."""
        return self.act_scales.get(node.id)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32

    @property
    def use_pallas(self) -> bool:
        from pyopenvino_tpu.config import Backend

        return self.config.backend == Backend.PALLAS

    @property
    def pallas_interpret(self) -> bool:
        """Pallas kernels run in interpreter mode off-TPU (tests/CI on CPU)."""
        import jax

        return jax.default_backend() != "tpu"

    def static_value(self, node, port: int) -> np.ndarray:
        src, sport = self.model.in_edges[node.id][port]
        val = self.analysis.value(src, sport)
        if val is None:
            raise ValueError(
                f"{node.op_type} {node.name!r}: input port {port} must be "
                f"compile-time constant"
            )
        return val

    def weight_for(self, node, tv: TValue):
        """Resolve a weight operand, dequantizing INT8 consts at trace time
        (the Pallas backend instead reads tv.arr/tv.qscale directly and fuses
        the dequant into the kernel epilogue)."""
        if tv.qscale is None:
            return tv.arr
        return tv.arr.astype(self.compute_dtype) * tv.qscale


class CompiledNetwork:
    def __init__(
        self,
        model: Model,
        config: Optional[Config] = None,
        mesh=None,
        quantized: Optional[Dict[int, Tuple[np.ndarray, np.ndarray]]] = None,
        act_scales: Optional[Dict[int, float]] = None,
        bias_corr: Optional[Dict[int, np.ndarray]] = None,
    ):
        import jax

        self.model = model
        self.config = config or Config()
        self.mesh = mesh
        self.analysis = infer_shapes(model)
        self._quantized = quantized or {}
        # {consumer node id: activation scale} for INT8_FULL (calibrate.py)
        self.act_scales = act_scales or {}
        # {bias const id: per-channel delta} (passes/bias_correct.py) —
        # applied when the weight pytree materializes, never to the Nodes
        self._bias_corr = bias_corr or {}

        self._folded_nodes = self._find_folded_nodes()
        self._runtime_consts = self._find_runtime_consts()

        # Epilogue fusion (Conv/MatMul → Add bias → ReLU/Clamp) on every
        # compiled backend — the absorbed nodes are skipped during
        # emission.  XLA would fuse the elementwise tail anyway; doing it
        # at emission level is what lets the INT8-FULL dataflow requantize
        # inside the producing epilogue (see _find_int8_edges).
        from pyopenvino_tpu.config import Backend

        if self.config.backend in (Backend.XLA, Backend.PALLAS):
            from pyopenvino_tpu.passes.fuse import find_fusions

            self._fusions = find_fusions(model, self.analysis)
        else:
            self._fusions = {}
        self._fused_skip = {
            nid for f in self._fusions.values() for nid in f.skip
        }
        self._int8_edges = self._find_int8_edges()

        # Stateful inference (ReadValue/Assign): the traced function is a
        # functional state transformer fn(weights, inputs, state) ->
        # (outputs, new_state); the state pytree argument is DONATED so XLA
        # aliases new_state onto the input buffers — in-place device update,
        # zero per-step allocation (ops/state_ops.py module docstring).
        from pyopenvino_tpu.ops.state_ops import model_variables

        self.variables = model_variables(model, self.analysis)
        self.state = None  # {variable_id: device array}, lazily reset

        self.weights = self._build_weights()
        self._fn = self._build_fn()
        if self.variables:
            self._jitted = jax.jit(self._fn, donate_argnums=(2,))
        else:
            self._jitted = jax.jit(self._fn)
        self._batched_cache: Dict[int, object] = {}
        self.input_names = [n.name for n in model.parameters]
        self.output_names = [n.name for n in model.results]

    @property
    def jitted_fn(self):
        """The compiled whole-graph callable ``fn(weights, inputs[,
        state])`` over the DECLARED shapes — for benchmark/serving paths
        that manage device placement and batching themselves (e.g. a
        bake_batch-compiled program, where batched_fn's vmap wrapper
        would add a second batch axis)."""
        return self._jitted

    # -- graph partitioning -------------------------------------------------

    def _find_folded_nodes(self):
        """Runtime nodes whose every output is statically known → not traced
        (shared definition — the pipeline partitioner must agree)."""
        from pyopenvino_tpu.passes.util import folded_nodes

        return folded_nodes(self.model, self.analysis)

    def _find_runtime_consts(self):
        """Const nodes with at least one traced consumer."""
        runtime = set()
        for node in self.model.find_by_type("Const"):
            for sport, dst, dport in self.model.out_edges[node.id]:
                dst_node = self.model.nodes[dst]
                if (dst_node.op_type, dport) in STATIC_PORTS:
                    continue
                if dst in self._folded_nodes:
                    continue
                runtime.add(node.id)
                break
        return runtime

    def _find_int8_edges(self) -> Dict[Tuple[int, int], float]:
        """INT8-FULL inter-layer storage decision: {(src, sport): scale}
        for every traced tensor that can travel HBM as int8.

        Backward demand propagation over the FUSED graph (a fused group
        produces at its chain-end key, after bias/activation).  Each
        consumer of a tensor yields a storage scale:

          * conv-family data input with a calibrated activation scale and
            int8 weights (SINK) — yields its calibrated scale; it consumes
            int8 directly on the MXU integer path, so storing costs nothing
            it would not pay quantizing on the fly;
          * MaxPool / ReLU (CARRY) — max commutes with the positive dequant
            scale, so these consume int8 and re-emit it at the same scale
            EXACTLY; they yield whatever their own output edge demands;
          * Concat (CARRY) — pure byte-shuffle in int8 once every input is
            stored at one common scale; yields its output edge's demand to
            ALL its inputs (inception joins travel int8 end to end);
          * LRN / AvgPool (ACCEPTER) — compute in f32 internally but fuse
            the int8 dequant into their read (bytes halved); they yield the
            calibrated scale observed at their own data input
            (passes/calibrate.py observes these ops for exactly this);
          * anything else — blocks storage of this edge (the central
            dequant guard in _build_fn keeps such reads correct anyway,
            but storing would add quantization error with no sink to
            benefit).

        A tensor is stored int8 at max(yielded scales) when every traced
        consumer yields one.  This halves the HBM bytes of each qualifying
        edge — the dominant cost of the bandwidth-bound CNN trunks
        (measured: GoogLeNet/SSD are HBM-bound almost everywhere,
        docs/MEASUREMENTS.md; the GoogLeNet stem chain
        conv-pool-LRN-conv-conv-LRN-pool alone is ~54% of device time)."""
        from pyopenvino_tpu.config import Backend, QuantMode

        if (
            self.config.quant != QuantMode.INT8_FULL
            or not self.act_scales
            or self.config.backend != Backend.XLA
            or not self.config.int8_dataflow
        ):
            return {}
        model = self.model
        roots = ("Convolution", "GroupConvolution", "MatMul")
        accepters = ("LRN", "AvgPool")

        memo: Dict[Tuple[int, int], Optional[float]] = {}

        def demand(key: Tuple[int, int]) -> Optional[float]:
            if key in memo:
                return memo[key]
            memo[key] = None  # DAG, but guard anyway
            src, sport = key
            consumers = [
                (dst, dport)
                for p, dst, dport in model.out_edges[src]
                if p == sport
            ]
            scales = []
            for dst, dport in consumers:
                if dst in self._folded_nodes:
                    # a statically-folded consumer (e.g. ShapeOf feeding a
                    # folded shape subgraph) never reads the traced tensor
                    # at runtime — it must not block int8 storage
                    continue
                dn = model.nodes[dst]
                if dn.op_type in roots and dport == 0:
                    s = self.act_scales.get(dst)
                    w_src = model.in_edges[dst].get(1)
                    if (
                        s is None
                        or w_src is None
                        or w_src[0] not in self._quantized
                    ):
                        return None
                    scales.append(s)
                elif dn.op_type in ("MaxPool", "ReLU") and dport == 0:
                    # exact carry: propagate the output edge's demand only —
                    # no calibrated-scale fallback, so a carry chain with no
                    # quantizing consumer downstream (e.g. pool → Result)
                    # stays full-precision, honoring the contract below
                    s = demand((dst, dn.out_port))
                    if s is None:
                        return None
                    scales.append(s)
                elif dn.op_type == "Concat" and dst not in self._fused_skip:
                    s = demand((dst, dn.out_port))
                    if s is None:
                        return None
                    scales.append(s)
                elif dn.op_type in accepters and dport == 0:
                    s = self.act_scales.get(dst)
                    if s is None:
                        return None
                    scales.append(s)
                else:
                    return None
            if not scales:
                return None  # no traced consumers (or Result-only)
            memo[key] = max(scales)
            return memo[key]

        produced = {}
        for nid, f in self._fusions.items():
            produced[f.out_key] = nid
        for node in model:
            if node.op_type in ("Const", "Parameter", "Result"):
                continue
            if (
                node.id not in self._fusions
                and node.id not in self._folded_nodes
                and node.id not in self._fused_skip
            ):
                for port in node.outputs:
                    produced[(node.id, port)] = node.id

        out: Dict[Tuple[int, int], float] = {}
        for key in produced:
            s = demand(key)
            if s is not None:
                out[key] = s
        return out

    def _build_weights(self):
        """Device weight pytree.  Float weights are pre-cast to the compute
        dtype at load (the reference re-decodes .bin consts every inference,
        Const.py:11-14 — here they are decoded once and live on device)."""
        import jax.numpy as jnp

        compute_dtype = (
            jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        )
        weights = {}
        for nid in sorted(self._runtime_consts):
            node = self.model.nodes[nid]
            if node.const is None:
                raise RuntimeError(
                    f"Const {node.name!r} has no weights; generate a .bin "
                    f"(tools/gen_weights.py) or load one"
                )
            if nid in self._quantized:
                qvals, scales = self._quantized[nid]
                weights[str(nid)] = jnp.asarray(qvals)
                weights[f"{nid}.scale"] = jnp.asarray(
                    scales, dtype=compute_dtype
                )
            elif nid in self._bias_corr:
                corr = self._bias_corr[nid].reshape(node.const.shape)
                weights[str(nid)] = jnp.asarray(
                    node.const + corr, dtype=compute_dtype
                )
            elif np.issubdtype(node.const.dtype, np.floating):
                weights[str(nid)] = jnp.asarray(node.const, dtype=compute_dtype)
            else:
                weights[str(nid)] = jnp.asarray(node.const)

        # Subgraph-body Consts (TensorIterator/Loop/If) join the same
        # pytree so body weights are device-resident, shardable params —
        # never baked literals (ops/subgraph.py body_const_weights).
        from pyopenvino_tpu.ops.subgraph import body_const_weights

        for node in self.model.nodes.values():
            if node.subgraphs:
                weights.update(body_const_weights(node, compute_dtype))

        # Large folded (statically-computed) values consumed by traced nodes
        # become weight params instead of baked literals — keeps the
        # executable small and the values device-placeable/shardable.
        for (src, sport), val in self.analysis.values.items():
            if val.size <= _INLINE_LIMIT:
                continue
            if self.model.nodes[src].op_type == "Const":
                continue  # runtime consts are handled above
            consumed_by_trace = any(
                dst not in self._folded_nodes
                and (self.model.nodes[dst].op_type, dport) not in STATIC_PORTS
                for p, dst, dport in self.model.out_edges[src]
                if p == sport
            )
            if consumed_by_trace:
                weights[f"folded.{src}.{sport}"] = jnp.asarray(val)
        return weights

    # -- emission ------------------------------------------------------------

    def _build_fn(self, capture: Optional[frozenset] = None):
        """Trace the whole graph.  With `capture`, the traced function also
        returns {node_name: activation} for the named nodes — the compiled-
        path analogue of the reference's expected_result per-layer hook
        (inference_engine.py:214,284-287), used by verify_against_interpreter.
        """
        model = self.model
        analysis = self.analysis
        config = self.config
        folded = self._folded_nodes
        runtime_consts = self._runtime_consts
        quantized = self._quantized
        fusions = self._fusions
        fused_skip = self._fused_skip
        int8_edges = self._int8_edges
        if capture is not None:
            # Debug builds emit every node unfused so any node's own
            # activation (e.g. a conv BEFORE its bias/ReLU tail) is
            # capturable and matches the interpreter exactly; int8
            # inter-layer storage is keyed on the fused graph, so it is
            # disabled alongside (capture is a debugging path).
            fusions, fused_skip, int8_edges = {}, set(), {}
        ctx = EmitCtx(model, analysis, config, self.act_scales, int8_edges)
        variables = self.variables

        def fn(weights, inputs, state=None):
            import jax.numpy as jnp

            ctx.weights = weights  # body-const lookups (ops/subgraph.py)
            values: Dict[Tuple[int, int], TValue] = {}
            captured: Dict[str, object] = {}
            # un-assigned (read-only) variables pass through: the returned
            # state aliases the donated input buffer.  Assign writes and
            # dynamic-init commits are staged SEPARATELY and merged at the
            # end with Assign taking precedence — emission follows topo
            # order, so an Assign whose input does not consume the
            # ReadValue output can be emitted BEFORE it, and a direct
            # new_state write from the later ReadValue would silently
            # clobber the assignment (the interpreter commits pending
            # Assigns after the walk — runtime/interpreter.py).
            new_state = dict(state) if variables else {}
            assigned: Dict[str, object] = {}
            init_commit: Dict[str, object] = {}

            def store(key, tv):
                """Register a produced tensor; int8-storage edges are
                requantized here so XLA fuses the quantize into the
                producer's epilogue and the HBM write is 1 byte/elem.
                Carry ops (MaxPool/ReLU/Concat) emit int8 TValues
                directly — those pass through at their carried scale."""
                s = int8_edges.get(key)
                if s is not None and tv.act_scale is None:
                    tv = TValue(
                        TValue.quantize(tv.arr, s), tv.layout, act_scale=s
                    )
                values[key] = tv

            def tv_for(src: int, sport: int) -> TValue:
                key = (src, sport)
                if key in values:
                    return values[key]
                # large folded values live in the weight pytree, small ones
                # inline as literals (_INLINE_LIMIT policy)
                wkey = f"folded.{src}.{sport}"
                if wkey in weights:
                    values[key] = TValue(weights[wkey], "L")
                    return values[key]
                val = analysis.value(src, sport)
                if val is None:
                    raise RuntimeError(
                        f"no traced or static value for node {src} port {sport}"
                    )
                values[key] = TValue(jnp.asarray(val), "L")
                return values[key]

            outputs: Dict[str, object] = {}
            for node in model:
                if node.op_type == "Parameter":
                    info = node.outputs[node.out_port]
                    x = inputs[node.name]
                    x = x.reshape(info.shape)
                    if np.issubdtype(info.dtype, np.floating):
                        x = x.astype(ctx.compute_dtype)
                    else:
                        x = x.astype(info.dtype)
                    values[(node.id, node.out_port)] = TValue(x, "L")
                elif node.op_type == "Const":
                    if node.id in runtime_consts:
                        arr = weights[str(node.id)]
                        qscale = (
                            weights.get(f"{node.id}.scale")
                            if node.id in quantized
                            else None
                        )
                        values[(node.id, node.out_port)] = TValue(
                            arr, "L", qscale=qscale
                        )
                elif node.op_type == "Result":
                    src, sport = model.in_edges[node.id][0]
                    out = tv_for(src, sport).dequant().nchw()
                    out_dtype = node.inputs[0].dtype
                    outputs[node.name] = out.astype(out_dtype)
                elif node.op_type == "ReadValue":
                    from pyopenvino_tpu.ops.state_ops import variable_id

                    vid = variable_id(node)
                    x = state[vid]
                    if variables[vid]["dynamic_init"]:
                        # input-dependent init subgraph: the first infer
                        # after a reset reads the TRACED init value and
                        # commits it, selected by the per-variable fresh
                        # flag — matching the interpreter twin's
                        # first-run initialization
                        # (runtime/interpreter.py ReadValue branch)
                        var = variables[vid]
                        src, sport = model.in_edges[node.id][0]
                        init = (
                            tv_for(src, sport).dequant().nchw()
                            .astype(var["dtype"])
                        )
                        init = (
                            init.reshape(var["shape"])
                            if init.size == int(np.prod(var["shape"]))
                            # batch-baked variable (IENetwork.reshape):
                            # init broadcasts across the baked batch
                            else jnp.broadcast_to(init, var["shape"])
                        )
                        fresh = state[vid + _FRESH]
                        x = jnp.where(fresh, init, x)
                        init_commit[vid] = x
                        new_state[vid + _FRESH] = jnp.zeros((), bool)
                    if np.issubdtype(np.dtype(x.dtype), np.floating):
                        x = x.astype(ctx.compute_dtype)
                    values[(node.id, node.out_port)] = TValue(x, "L")
                elif node.op_type == "Assign":
                    from pyopenvino_tpu.ops.state_ops import variable_id

                    vid = variable_id(node)
                    src, sport = model.in_edges[node.id][0]
                    assigned[vid] = (
                        tv_for(src, sport)
                        .dequant()
                        .nchw()
                        .astype(variables[vid]["dtype"])
                    )
                elif node.id in folded:
                    continue  # consumers pull the folded constant lazily
                elif node.id in fused_skip:
                    continue  # absorbed into a fused group's epilogue
                else:
                    op = get_op(node.op_type)
                    int8_ports = getattr(op, "int8_ports", ())
                    ins = {}
                    for port, (src, sport) in sorted(
                        model.in_edges[node.id].items()
                    ):
                        if (node.op_type, port) in STATIC_PORTS:
                            continue
                        tv = tv_for(src, sport)
                        # central dequant guard: an int8-stored activation
                        # reaching an op that does not declare int8
                        # handling for this port is dequantized here (the
                        # convert+scale fuses into the consumer — the HBM
                        # read stays 1 byte/elem), so correctness never
                        # depends on the edge analysis above
                        if not (int8_ports == "all" or port in int8_ports):
                            tv = tv.dequant(ctx.compute_dtype)
                        ins[port] = tv
                    # named scope → HLO metadata → measured per-node cost in
                    # profile()/runtime/profiling.py (trace-time only; free
                    # at execution)
                    import jax

                    scope = jax.named_scope(f"{node.op_type}_{node.id}")
                    if node.id in fusions:
                        f = fusions[node.id]
                        bias = (
                            tv_for(*f.bias_src).arr.reshape(-1)
                            if f.bias_src is not None
                            else None
                        )
                        with scope:
                            outs = op.emit_fused(
                                ctx, node, ins, bias=bias, act=f.act
                            )
                        store(f.out_key, outs[node.out_port])
                    else:
                        with scope:
                            outs = op.emit(ctx, node, ins)
                        for port, tv in outs.items():
                            store((node.id, port), tv)
                if capture and node.name in capture and node.outputs:
                    # (Result nodes have no output ports — their value is
                    # already in `outputs` under the same name)
                    key = (node.id, node.out_port)
                    if key in values:
                        captured[node.name] = values[key].dequant().nchw()
            if variables:
                # merge staged state writes: Assign wins over the
                # dynamic-init commit (OpenVINO variable semantics —
                # the assignment IS the next state)
                new_state.update(init_commit)
                new_state.update(assigned)
            if capture is not None:
                if variables:
                    return outputs, new_state, captured
                return outputs, captured
            if variables:
                return outputs, new_state
            return outputs

        return fn

    # -- execution -----------------------------------------------------------

    def _prep_inputs(self, inputs: Dict[str, np.ndarray]):
        prepped = {}
        for node in self.model.parameters:
            if node.name not in inputs:
                raise KeyError(f"missing input for Parameter {node.name!r}")
            info = node.outputs[node.out_port]
            prepped[node.name] = np.asarray(inputs[node.name]).reshape(info.shape)
        return prepped

    def __call__(self, inputs: Dict[str, np.ndarray]):
        """Run one inference at the declared (batch=1) shapes; returns numpy."""
        if self.variables:
            if self.state is None:
                self.reset_state()
            # the previous state buffers are donated (aliased in place by
            # XLA) — self.state MUST be replaced by the returned pytree
            out, self.state = self._jitted(
                self.weights, self._prep_inputs(inputs), self.state
            )
        else:
            out = self._jitted(self.weights, self._prep_inputs(inputs))
        return {k: np.asarray(v) for k, v in out.items()}

    # -- variable state (ReadValue/Assign — ops/state_ops.py) -----------------

    def fresh_state(self) -> Dict[str, object]:
        """A brand-new device state pytree: init values (zeros placeholder
        for dynamic-init variables, computed at the first infer) plus the
        per-variable fresh flags the traced function selects on.  This is
        the unit of PER-REQUEST state: api.InferRequest threads its own
        pytree through step(), so concurrent requests never share (or
        double-donate) state buffers — OpenVINO scopes variable state per
        InferRequest."""
        import jax.numpy as jnp

        from pyopenvino_tpu.ops.state_ops import initial_state

        state = {
            k: jnp.asarray(v)
            for k, v in initial_state(self.variables).items()
        }
        for vid, var in self.variables.items():
            if var["dynamic_init"]:
                state[vid + _FRESH] = jnp.ones((), bool)
        return state

    def step(self, inputs, state):
        """One stateful inference with CALLER-OWNED state → (outputs,
        new_state).  ``state`` is donated to the jitted call; callers must
        drop their reference and keep the returned pytree (the donated
        buffers are aliased in place on device)."""
        out, new_state = self._jitted(
            self.weights, self._prep_inputs(inputs), state
        )
        return {k: np.asarray(v) for k, v in out.items()}, new_state

    def state_to_host(self, state) -> Dict[str, np.ndarray]:
        """{variable_id: host array} view of a state pytree (fresh flags
        elided — they are an executor detail, not a variable)."""
        return {vid: np.asarray(state[vid]) for vid in self.variables}

    def state_with(self, state, values: Dict[str, np.ndarray]):
        """Copy of ``state`` with the given variables overwritten
        (validated against the declared shape/dtype); setting a
        dynamic-init variable clears its fresh flag — an explicit value
        wins over the init subgraph, like OpenVINO's state setter."""
        import jax.numpy as jnp

        state = dict(state)
        for vid, val in values.items():
            if vid not in self.variables:
                raise KeyError(f"unknown variable {vid!r}")
            var = self.variables[vid]
            arr = np.asarray(val, dtype=var["dtype"]).reshape(var["shape"])
            state[vid] = jnp.asarray(arr)
            if var["dynamic_init"]:
                state[vid + _FRESH] = jnp.zeros((), bool)
        return state

    def reset_state(self):
        """(Re-)initialize every variable from its init subgraph (zeros when
        init-less) — OpenVINO VariableState.reset for all variables."""
        self.state = self.fresh_state()

    def query_state(self) -> Dict[str, np.ndarray]:
        """Current {variable_id: value} (host copies, safe to hold across
        the next donated step)."""
        if self.state is None:
            self.reset_state()
        return self.state_to_host(self.state)

    def set_state(self, values: Dict[str, np.ndarray]):
        """Overwrite variables by id (OpenVINO VariableState.state setter)."""
        if self.state is None:
            self.reset_state()
        self.state = self.state_with(self.state, values)

    def state_with_reset(self, state, vid: str):
        """Copy of ``state`` with ONE variable reset to its init, others
        untouched (OpenVINO ``VariableState.reset``).  A dynamic-init
        variable re-arms its fresh flag so the next infer recomputes the
        init subgraph."""
        import jax.numpy as jnp

        from pyopenvino_tpu.ops.state_ops import initial_state

        if vid not in self.variables:
            raise KeyError(f"unknown variable {vid!r}")
        state = dict(state)
        state[vid] = jnp.asarray(initial_state(self.variables)[vid])
        if self.variables[vid]["dynamic_init"]:
            state[vid + _FRESH] = jnp.ones((), bool)
        return state

    def reset_variable(self, vid: str):
        if self.state is None:
            self.reset_state()
        self.state = self.state_with_reset(self.state, vid)

    def infer(self, inputs, verbose: bool = False):
        import time

        t0 = time.perf_counter()
        out = self(inputs)
        if verbose:
            print(f"@TOTAL_TIME, {time.perf_counter() - t0}")
        return out

    # -- batched execution (vmap over the batch=1 graph) ---------------------
    # When a mesh is attached (parallel/mesh.py shard_compiled sets
    # _w_shardings/_batch_pspec), the same jitted functions are built with
    # explicit shardings — there is exactly one implementation of the
    # batching logic.

    _w_shardings = None   # {weight_key: NamedSharding} or None
    _batch_pspec = None   # PartitionSpec for the leading batch axis
    _spatial_axis = None  # mesh axis name for H-axis spatial partitioning

    def batched_fn(self, batch_size: int):
        """jit-compiled function over a leading batch axis, cached per size."""
        import jax

        if self.variables:
            raise NotImplementedError(
                "stateful networks (ReadValue/Assign) run at their declared "
                "shapes — vmap over the batch axis would replicate variable "
                "state per example with no defined cross-step identity; "
                "bake the batch into the IR instead (IENetwork.reshape)"
            )
        if batch_size in self._batched_cache:
            return self._batched_cache[batch_size]

        param_infos = {
            n.name: n.outputs[n.out_port] for n in self.model.parameters
        }
        collapse = {
            n.name: (len(n.inputs[0].shape) > 0 and n.inputs[0].shape[0] == 1)
            for n in self.model.results
        }
        fn = self._fn

        def single(weights, example):
            ins = {
                name: example[name].reshape(param_infos[name].shape)
                for name in example
            }
            return fn(weights, ins)

        spatial_axis = self._spatial_axis
        mesh = self.mesh

        def batched(weights, batch):
            if spatial_axis is not None:
                # SP: constrain each (B, ..., H, W) input's H axis to the
                # 'spatial' mesh axis — GSPMD propagates the sharding
                # through the traced graph and inserts halo exchanges at
                # every window op (parallel/mesh.py module docstring)
                from jax.sharding import NamedSharding, PartitionSpec

                def constrain(v):
                    if v.ndim < 4:
                        return v
                    spec = [None] * v.ndim
                    spec[0] = self._batch_pspec[0] if len(
                        self._batch_pspec
                    ) else None
                    spec[v.ndim - 2] = spatial_axis
                    return jax.lax.with_sharding_constraint(
                        v, NamedSharding(mesh, PartitionSpec(*spec))
                    )

                batch = {k: constrain(v) for k, v in batch.items()}
            out = jax.vmap(single, in_axes=(None, 0))(weights, batch)
            # each output is (B, 1, ...) — collapse the declared unit
            # batch dim.  Outputs whose declared shape has NO unit batch
            # (a ShapeOf → Result vector) pass through as (B, ...).
            return {
                k: v.reshape((v.shape[0],) + v.shape[2:])
                if collapse.get(k, True) else v
                for k, v in out.items()
            }

        if self._w_shardings is not None:
            from jax.sharding import NamedSharding

            data_sharding = {
                name: NamedSharding(self.mesh, self._batch_pspec)
                for name in param_infos
            }
            out_sharding = {
                n.name: NamedSharding(self.mesh, self._batch_pspec)
                for n in self.model.results
            }
            # outputs are DP-sharded only: under TP the last layer would
            # otherwise leave results channel-sharded over 'model'; the
            # constraint makes XLA all-gather them inside the program
            # (over ICI), so every consumer sees batch-sharded full rows
            jitted = jax.jit(
                batched,
                in_shardings=(self._w_shardings, data_sharding),
                out_shardings=out_sharding,
            )
        else:
            jitted = jax.jit(batched)
        self._batched_cache[batch_size] = jitted
        return jitted

    def infer_batch(self, inputs: Dict[str, np.ndarray]):
        """inputs: {name: (B, ...)} with the declared batch=1 dim dropped."""
        b = next(iter(inputs.values())).shape[0]
        out = self.batched_fn(b)(self.weights, inputs)
        return {k: np.asarray(v) for k, v in out.items()}

    # -- weight checkpointing -------------------------------------------------
    # The reference's model state is read-only .bin weights re-decoded every
    # run (Const.py:11-14); here the processed (cast / INT8-quantized) weight
    # pytree can be saved once and reloaded, skipping decode + quantization.

    # npz can't represent ml_dtypes.bfloat16 (round-trips as raw '|V2'),
    # so bf16 arrays are stored as uint16 bit patterns under a tagged key.
    _BF16_TAG = "::bf16"

    def save_weights(self, path: str):
        import ml_dtypes

        out = {}
        for k, v in self.weights.items():
            arr = np.asarray(v)
            if arr.dtype == ml_dtypes.bfloat16:
                out[k + self._BF16_TAG] = arr.view(np.uint16)
            else:
                out[k] = arr
        np.savez_compressed(path, **out)

    def load_weights(self, path: str):
        import jax.numpy as jnp
        import ml_dtypes

        with np.load(path) as data:
            loaded = {}
            for k in data.files:
                if k.endswith(self._BF16_TAG):
                    loaded[k[: -len(self._BF16_TAG)]] = data[k].view(
                        ml_dtypes.bfloat16
                    )
                else:
                    loaded[k] = data[k]
        missing = set(self.weights) - set(loaded)
        if missing:
            raise KeyError(f"checkpoint missing weights: {sorted(missing)[:5]}")
        for k, v in self.weights.items():
            if loaded[k].shape != v.shape or loaded[k].dtype != v.dtype:
                raise ValueError(
                    f"weight {k!r}: checkpoint {loaded[k].dtype}{loaded[k].shape} "
                    f"!= expected {v.dtype}{v.shape}"
                )
        extras = set(loaded) - set(self.weights)
        if extras:
            raise KeyError(
                f"checkpoint has {len(extras)} unknown weight key(s), e.g. "
                f"{sorted(extras)[:5]} — wrong model or config?"
            )
        self.weights = {k: jnp.asarray(v) for k, v in loaded.items()}

    # -- AOT export (OpenVINO export_model/import_network parity) -------------

    def export(self, path: str, buckets=(8, 32)) -> None:
        """Serialize this compiled network (StableHLO via ``jax.export`` +
        the processed weight pytree) into a self-contained artifact that
        ``runtime.export.import_compiled`` loads WITHOUT the IR — the
        TPU-native form of OpenVINO's compiled-blob export
        (``ExecutableNetwork.export``; the reference has no analogue and
        re-parses the XML every start, inference_engine.py:74-83)."""
        from pyopenvino_tpu.runtime.export import export_compiled

        export_compiled(self, path, buckets=buckets)

    # -- per-layer debugging --------------------------------------------------

    def infer_with_capture(self, inputs, names):
        """One device execution returning (results, {node_name: activation})
        for the named nodes (logical NCHW layout) — per-layer debugging on
        the compiled path without falling back to the interpreter."""
        import jax

        key = frozenset(names)
        if not hasattr(self, "_capture_cache"):
            self._capture_cache = {}
        if key not in self._capture_cache:
            self._capture_cache[key] = jax.jit(self._build_fn(capture=key))
        if self.variables:
            if self.state is None:
                self.reset_state()
            # capture jits are NOT donated — the state survives for the
            # main jitted step; the returned state is still committed so
            # capture runs advance time like infer does
            outputs, self.state, captured = self._capture_cache[key](
                self.weights, self._prep_inputs(inputs), self.state
            )
        else:
            outputs, captured = self._capture_cache[key](
                self.weights, self._prep_inputs(inputs)
            )
        return (
            {k: np.asarray(v) for k, v in outputs.items()},
            {k: np.asarray(v) for k, v in captured.items()},
        )

    def capture_activations(self, inputs, names) -> Dict[str, np.ndarray]:
        """{node_name: activation} for the named nodes (see
        infer_with_capture, which also returns the results)."""
        return self.infer_with_capture(inputs, names)[1]

    def verify_against_interpreter(
        self, inputs, names=None, rtol=1e-3, atol=1e-4
    ):
        """Differential per-layer check: compiled activations vs the numpy
        interpreter — the reference's expected_result workflow
        (inference_engine.py:214,284-287) with the interpreter as golden.
        Returns {name: max_abs_diff}; raises on mismatch beyond tolerance."""
        model = self.model
        import numpy as _np

        params = self._prep_inputs(inputs)
        golden: Dict[str, np.ndarray] = {}
        if names is None:
            names = [
                n.name for n in model
                if n.op_type not in ("Const", "Parameter", "Result")
            ]
        name_set = set(names)

        # single interpreter pass retaining requested activations; stateful
        # nets are verified from the initial state on both sides
        if self.variables:
            from pyopenvino_tpu.ops.state_ops import initial_state

            istate = initial_state(self.variables)
            self.reset_state()
        values = {}
        for node in model:
            ins = {
                p: values[(s, sp)]
                for p, (s, sp) in sorted(model.in_edges[node.id].items())
            }
            if node.op_type == "Parameter":
                info = node.outputs[node.out_port]
                outs = {
                    node.out_port: _np.asarray(params[node.name])
                    .reshape(info.shape).astype(info.dtype)
                }
            elif node.op_type == "Const":
                outs = {node.out_port: node.const}
            elif node.op_type == "Result":
                outs = {}
            elif node.op_type == "ReadValue":
                from pyopenvino_tpu.ops.state_ops import variable_id

                vid = variable_id(node)
                var = self.variables[vid]
                if var["dynamic_init"]:
                    # first-infer value IS the runtime init input
                    # (interpreter semantics for an unfoldable init);
                    # batch-baked variables broadcast the unbatched init
                    # like _build_fn does
                    iv = _np.asarray(ins[0], dtype=var["dtype"])
                    iv = (iv.reshape(var["shape"])
                          if iv.size == int(_np.prod(var["shape"]))
                          else _np.broadcast_to(iv, var["shape"]))
                    outs = {node.out_port: iv}
                else:
                    outs = {node.out_port: istate[vid]}
            elif node.op_type == "Assign":
                outs = {}
            else:
                from pyopenvino_tpu.ops import get_op

                outs = get_op(node.op_type).ref_compute(node, ins)
            for p, arr in outs.items():
                values[(node.id, p)] = arr
            if node.name in name_set and node.outputs:
                key = (node.id, node.out_port)
                if key in values:
                    golden[node.name] = values[key]

        got = self.capture_activations(inputs, sorted(golden))
        diffs = {}
        failures = []
        for name in sorted(golden):
            if name not in got:
                continue  # folded at compile time → no traced activation
            d = float(_np.abs(got[name].astype(_np.float64)
                              - golden[name].astype(_np.float64)).max())
            diffs[name] = d
            if not _np.allclose(got[name], golden[name], rtol=rtol, atol=atol):
                failures.append((name, d))
        if failures:
            raise AssertionError(
                f"{len(failures)} layer mismatches vs interpreter: "
                f"{failures[:5]}"
            )
        return diffs

    # -- profiling ------------------------------------------------------------

    def profile(
        self,
        inputs: Dict[str, np.ndarray],
        batch_size: Optional[int] = None,
        trace_dir: Optional[str] = None,
    ):
        """MEASURED per-op cost of one device execution — the compiled-path
        analogue of the reference's per-node wall-clock printout
        (inference_engine.py:273-283), via jax.profiler + hlo_stats
        (runtime/profiling.py).  Returns the raw per-HLO-op rows; aggregate
        with profiling.aggregate(rows, by='category'|'node').

        inputs: single-example dict, or {name: (B, ...)} with batch_size=B.
        """
        import tempfile

        import jax

        if batch_size is not None:
            fn, args = self.batched_fn(batch_size), (self.weights, inputs)
        elif self.variables:
            if self.state is None:
                self.reset_state()
            jitted = self._jitted

            def fn(weights, ins):
                # re-thread the donated state each call so the warm-up and
                # the traced run both execute on live buffers
                out, self.state = jitted(weights, ins, self.state)
                return out

            args = (self.weights, self._prep_inputs(inputs))
        else:
            fn, args = self._jitted, (self.weights, self._prep_inputs(inputs))
        out = fn(*args)  # warm: compile outside the trace
        k = next(iter(out))
        np.asarray(out[k]).ravel()[:1]  # tunnel-safe barrier

        from pyopenvino_tpu.runtime import profiling

        ctxdir = None
        if trace_dir is None:
            ctxdir = tempfile.TemporaryDirectory()
            trace_dir = ctxdir.name
        try:
            with jax.profiler.trace(trace_dir):
                out = fn(*args)
                np.asarray(out[k]).ravel()[:1]
            return profiling.parse_hlo_stats(trace_dir)
        finally:
            if ctxdir is not None:
                ctxdir.cleanup()

    def _lowered_exec(self):
        """Lower+compile the single-example program with zero-filled
        inputs — shared by the XLA cost/memory analyses so both always
        describe the same program."""
        zeros = {
            n.name: np.zeros(n.outputs[n.out_port].shape, np.float32)
            for n in self.model.parameters
        }
        if self.variables:
            return self._jitted.lower(
                self.weights, zeros, self.fresh_state()
            ).compile()
        return self._jitted.lower(self.weights, zeros).compile()

    def cost_analysis(self) -> Dict[str, float]:
        """XLA's cost model for the whole compiled program (flops, bytes
        accessed...) — the compile-time analogue of the reference's per-node
        wall-clock printout (inference_engine.py:273-283)."""
        return dict(self._lowered_exec().cost_analysis())

    def memory_analysis(self) -> Dict[str, int]:
        """Device-memory footprint of the compiled program from XLA's
        allocation report: weights/inputs (arguments), outputs, transient
        activation workspace (temp) and generated code bytes — the HBM
        budget counterpart of cost_analysis()."""
        ma = self._lowered_exec().memory_analysis()
        fields = (
            "argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        )
        return {f: int(getattr(ma, f)) for f in fields if hasattr(ma, f)}


def prepare_model(
    model: Model,
    config: Optional[Config] = None,
    calibration_samples=None,
):
    """Compile-time preprocessing shared by `compile_model` and the
    pipeline partitioner (parallel/pipeline.py): dead-branch elimination,
    BN-scale / FakeQuantize folding, INT8 weight quantization and
    activation calibration — everything that must see the WHOLE graph
    before it is traced (or cut into pipeline stages).

    Returns (model, quantized, act_scales, bias_corr) ready for
    CompiledNetwork.
    """
    config = config or Config()
    # Dead-branch elimination first: keeps dead weights out of the device
    # pytree and dead ops out of quantization/calibration.  (The numpy
    # Interpreter stays unpruned by design — passes/util.py.)
    from pyopenvino_tpu.passes.util import prune_dead_nodes

    model, _ = prune_dead_nodes(model)
    if calibration_samples is not None:
        # calibration and bias correction both iterate the samples — a
        # one-shot generator would be exhausted by the first pass
        calibration_samples = list(calibration_samples)
    # A weightless structural parse (no .bin found — ir/xml_parser.py
    # read_ir_model) is fine for inspection/weight-synthesis but cannot
    # compile; fail here with the cause instead of deep inside a pass.
    missing = [n.name for n in model
               if n.op_type == "Const" and n.const is None]
    if missing:
        raise ValueError(
            f"model has {len(missing)} Const node(s) without data — "
            f"weightless structural parse (was the .bin found?); first: "
            f"{missing[0]!r}"
        )
    # Graph rewrite: fold per-channel BN Multiply constants into conv
    # weights (before quantization, so INT8 scales see effective weights).
    from pyopenvino_tpu.passes.fold_scale import fold_scale_into_conv

    model = fold_scale_into_conv(model)
    # Fold weight-side FakeQuantize (POT/NNCF IRs) into the weight
    # consts so quantize_weights sees plain Const→weight-port edges.
    from pyopenvino_tpu.passes.fold_fq import fold_fake_quantize

    model = fold_fake_quantize(model)
    quantized = None
    act_scales = None
    fq_scales = {}
    if config.quant == QuantMode.INT8_FULL:
        # Activation-side FQ nodes with the symmetric zero-exact grid
        # ARE calibration data: convert them to native scales and drop
        # the emulation nodes (POT IRs run full-INT8 sample-free).
        from pyopenvino_tpu.passes.calibrate import QUANTIZABLE
        from pyopenvino_tpu.passes.fold_fq import extract_act_scales

        model, fq_scales = extract_act_scales(model, QUANTIZABLE)
    if config.quant in (QuantMode.INT8_WEIGHT, QuantMode.INT8_FULL):
        from pyopenvino_tpu.passes.quantize import quantize_weights

        quantized = quantize_weights(model, config.quant_min_elems)
    if config.quant == QuantMode.INT8_FULL:
        covered = set(fq_scales)
        needs_cal = [
            n.id for n in model
            if n.op_type in ("Convolution", "GroupConvolution", "MatMul")
            and n.id not in covered
        ]
        if needs_cal and not calibration_samples:
            raise ValueError(
                "QuantMode.INT8_FULL needs calibration_samples "
                "(representative {input_name: blob} dicts) — the model "
                f"carries FakeQuantize scales for {len(covered)} "
                f"consumers but {len(needs_cal)} quantizable ops have "
                "none"
            )
        if needs_cal:
            from pyopenvino_tpu.passes.calibrate import (
                calibrate_activations,
            )

            act_scales = calibrate_activations(
                model, calibration_samples,
                percentile=config.calibration_percentile,
                method=config.calibration_method,
            )
            # IR-carried scales are authoritative where present
            act_scales.update(fq_scales)
        else:
            act_scales = fq_scales
    bias_corr = None
    if config.bias_correction and quantized:
        if not calibration_samples:
            raise ValueError(
                "Config.bias_correction needs calibration_samples (the "
                "correction is E[(W - deq(Wq))*x] over representative "
                "inputs — passes/bias_correct.py)"
            )
        from pyopenvino_tpu.passes.bias_correct import bias_corrections
        from pyopenvino_tpu.passes.shape_infer import infer_shapes

        bias_corr = bias_corrections(
            model, infer_shapes(model), quantized, calibration_samples
        )
    return model, quantized, act_scales, bias_corr


def compile_model(
    model: Model,
    config: Optional[Config] = None,
    mesh=None,
    calibration_samples=None,
    bake_batch: Optional[int] = None,
) -> CompiledNetwork:
    """calibration_samples: iterable of {param_name: blob} input dicts,
    required for QuantMode.INT8_FULL (activation scales — passes/calibrate).

    ``bake_batch``: compile the graph AT that batch instead of vmapping
    the declared batch-1 program — rank-4 activations let the TPU conv
    emitters keep one layout (GoogLeNet +17%, passes/shape_infer.py
    bake_batch).  Quantization/calibration still run on the declared
    shapes; only the traced program changes.  Graphs that drop the batch
    dim in a Reshape raise (fall back to vmap batching)."""
    config = config or Config()
    model, quantized, act_scales, bias_corr = prepare_model(
        model, config, calibration_samples
    )
    if bake_batch is not None:
        from pyopenvino_tpu.passes.shape_infer import (
            bake_batch as _bake_batch,
        )

        model = _bake_batch(model, bake_batch)
    net = CompiledNetwork(
        model, config, mesh=mesh, quantized=quantized,
        act_scales=act_scales, bias_corr=bias_corr,
    )
    # Config-declared mesh: build it and attach shardings (DP over 'data',
    # TP over 'model' when mesh_model > 1, SP over 'spatial' when
    # mesh_spatial > 1).
    spatial = config.mesh_spatial
    if mesh is None and config.mesh_data * config.mesh_model * spatial > 1:
        from pyopenvino_tpu.parallel.mesh import (
            MeshConfig, build_mesh, shard_compiled,
        )

        built = build_mesh(
            MeshConfig(config.mesh_data, config.mesh_model, spatial)
        )
        shard_compiled(
            net, built,
            tensor_parallel=config.mesh_model > 1,
            spatial_parallel=spatial > 1,
        )
    return net
