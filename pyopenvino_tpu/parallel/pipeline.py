"""Pipeline-parallel inference over a 'stage' mesh axis.

The reference is single-process / single-device with no partitioning of any
kind (SURVEY.md §2.4 marks pipeline parallelism absent); its flat task list
cannot even express a stage cut.  This module supplies the TPU-native
pipeline tier on top of the typed graph IR:

  * **Partitioning** — the graph is cut at *articulation tensors* (a single
    activation crossing the frontier) chosen by a balanced-cost DP over
    per-node FLOP estimates, never splitting a compile-time fusion group
    (conv+bias+act must stay in one stage so the INT8 epilogue fusion and
    dataflow analysis keep working per stage).
  * **Per-stage compilation** — each stage is a real sub-`Model` (shared
    `Node` objects, a synthetic `__pp_in__` Parameter / `__pp_out__` Result
    at the cut) compiled by the ordinary `CompiledNetwork`, so every
    backend/quantization feature (INT8 weight + full-INT8 dataflow, Pallas
    kernels, fusion) works inside a stage unchanged.  Quantization and
    calibration run on the FULL graph first (`compiler.prepare_model`), so
    cut placement cannot change the numerics.
  * **SPMD schedule** — one `shard_map` program over `Mesh(('data','stage'))`
    runs a GPipe microbatch pipeline: each device owns one stage's packed
    weights (rows of per-dtype flat buffers sharded `P('stage')`),
    `lax.switch` on `axis_index('stage')` dispatches the local stage
    function, and `lax.ppermute` shifts the (flat, padded) activation ring
    one stage forward per tick.  Heterogeneous stages — different activation
    shapes and weight pytrees per stage, unlike the homogeneous-transformer
    pipelines in public JAX codebases — are handled by flattening both into
    max-size buffers with static per-stage unflatten layouts.  XLA compiles
    the whole schedule (including the collectives, riding ICI on real
    hardware) into one executable; there is no per-tick host round trip.

Batch semantics match `CompiledNetwork.infer_batch`: inputs are
``{name: (B, ...)}`` with the declared batch=1 dim dropped; B is split into
``n_micro`` microbatches of ``B / n_micro`` examples, each microbatch sharded
over the 'data' axis (DP × PP compose).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from pyopenvino_tpu.config import Config
from pyopenvino_tpu.ir.model import Edge, Model, Node
# Runtime nodes with statically-known outputs behave like Consts for
# partitioning: they produce no runtime tensor, so their edges never cross
# a stage frontier — without the exclusion SSD's ShapeOf→PriorBox anchor
# chains (live across the whole trunk) would block every cut.  ONE shared
# definition with the compiler (passes/util.py).
from pyopenvino_tpu.passes.util import folded_nodes

# ---------------------------------------------------------------------------
# Cost model + cut-point selection
# ---------------------------------------------------------------------------


def _node_cost(model: Model, analysis, node: Node) -> float:
    """FLOP estimate for stage balancing (a proxy, not a roofline model:
    it only has to rank segment weights consistently)."""
    if not node.outputs:
        return 0.0
    out = analysis.shape(node.id, node.out_port)
    size = float(np.prod(out)) if out else 1.0
    if node.op_type in ("Convolution", "GroupConvolution"):
        w_src = model.in_edges[node.id].get(1)
        if w_src is not None:
            w = analysis.shape(*w_src)
            # OIHW: reduction = I*kh*kw (prod(w[2:]) = kh*kw, times I);
            # G-Co-Ci-kh-kw: prod(w[2:]) = Ci*kh*kw already
            red = float(np.prod(w[2:])) * (w[1] if len(w) == 4 else 1)
            return 2.0 * size * red
    if node.op_type == "MatMul":
        in0 = analysis.shape(*model.in_edges[node.id][0])
        return 2.0 * size * float(in0[-1])
    return size  # elementwise / data movement proxy


@dataclasses.dataclass(frozen=True)
class CutPoint:
    pos: int          # index into the runtime-node topo list (cut AFTER it)
    node_id: int      # the articulation node
    port: int         # its crossing output port
    size: int         # flat element count of the crossing tensor (batch-1)




def find_cut_candidates(model: Model, analysis) -> Tuple[List[int], List[CutPoint]]:
    """Runtime topo order + every valid single-tensor cut position.

    A cut after position p is valid when every runtime edge crossing the
    frontier originates from the SAME (node, port) — i.e. exactly one
    activation travels between the stages — the tensor is floating-point
    (it rides the f32 ppermute ring), no fusion group is split, and every
    Result's producer stays in the final segment.
    """
    from pyopenvino_tpu.passes.fuse import find_fusions

    folded = folded_nodes(model, analysis)
    rt = [
        n.id for n in model
        if n.op_type not in ("Const", "Result") and n.id not in folded
    ]
    pos = {nid: i for i, nid in enumerate(rt)}

    fusions = find_fusions(model, analysis)
    # block cuts strictly INSIDE a fusion group (root..last-absorbed-node);
    # a cut AT the group's chain end is fine — the whole group lies before
    # it (MobileNet trunks are wall-to-wall conv+bias+ReLU6 groups, so
    # blocking chain ends too would leave almost no candidates)
    blocked = set()
    for f in fusions.values():
        ps = [pos[n] for n in (f.root,) + f.skip if n in pos]
        blocked.update(range(min(ps), max(ps)))

    # runtime→runtime edges only (Const feeds are stage-local, folded
    # nodes produce compile-time values, Result consumers are pinned to
    # their producer's stage)
    redges = [
        e for e in model.edges
        if e.src in pos and e.dst in pos
    ]
    result_floor = min(
        (
            pos[model.in_edges[r.id][0][0]]
            for r in model.results
            if model.in_edges[r.id][0][0] in pos
        ),
        default=len(rt),
    )

    candidates: List[CutPoint] = []
    for p in range(len(rt) - 1):
        if p >= result_floor:
            break
        nid = rt[p]
        node = model.nodes[nid]
        if node.op_type == "Parameter" or p in blocked:
            continue
        crossing = {
            (e.src, e.src_port)
            for e in redges
            if pos[e.src] <= p < pos[e.dst]
        }
        if crossing != {(nid, node.out_port)}:
            continue
        info = node.outputs[node.out_port]
        if not np.issubdtype(info.dtype, np.floating):
            continue
        candidates.append(CutPoint(p, nid, node.out_port, info.size))
    return rt, candidates


def choose_cuts(
    model: Model, analysis, n_stages: int
) -> Tuple[List[int], List[CutPoint]]:
    """Pick n_stages-1 cut points minimizing the max per-stage FLOP cost
    (exact DP over the articulation candidates)."""
    rt, cands = find_cut_candidates(model, analysis)
    k = n_stages - 1
    if k == 0:
        return rt, []
    if len(cands) < k:
        raise ValueError(
            f"model {model.name!r} has only {len(cands)} valid pipeline cut "
            f"points; cannot split into {n_stages} stages"
        )
    costs = [_node_cost(model, analysis, model.nodes[nid]) for nid in rt]
    prefix = np.concatenate([[0.0], np.cumsum(costs)])

    def seg(i: int, j: int) -> float:  # cost of rt[i..j] inclusive
        return float(prefix[j + 1] - prefix[i])

    n = len(cands)
    INF = math.inf
    # dp[kk][j]: min max-cost splitting rt[0..cands[j].pos] into kk+1 pieces
    # with the last cut at cands[j]
    dp = [[INF] * n for _ in range(k)]
    arg = [[-1] * n for _ in range(k)]
    for j in range(n):
        dp[0][j] = seg(0, cands[j].pos)
    for kk in range(1, k):
        for j in range(n):
            for i in range(j):
                v = max(dp[kk - 1][i], seg(cands[i].pos + 1, cands[j].pos))
                if v < dp[kk][j]:
                    dp[kk][j] = v
                    arg[kk][j] = i
    best, bj = INF, -1
    for j in range(n):
        v = max(dp[k - 1][j], seg(cands[j].pos + 1, len(rt) - 1))
        if v < best:
            best, bj = v, j
    picks = [bj]
    for kk in range(k - 1, 0, -1):
        picks.append(arg[kk][picks[-1]])
    picks.reverse()
    return rt, [cands[j] for j in picks]


# ---------------------------------------------------------------------------
# Stage sub-model construction
# ---------------------------------------------------------------------------

PP_IN = "__pp_in__"
PP_OUT = "__pp_out__"


@dataclasses.dataclass
class StageSpec:
    model: Model
    cut_in: Optional[CutPoint]    # tensor this stage consumes (None = first)
    cut_out: Optional[CutPoint]   # tensor this stage produces (None = last)


def partition(
    model: Model, rt: List[int], cuts: List[CutPoint], analysis=None
) -> List[StageSpec]:
    """Cut the full model into len(cuts)+1 stage sub-models.  Node objects
    are shared with the full model (same ids — per-stage quantization
    subsets index by node id); each boundary gets a synthetic `__pp_in__`
    Parameter / `__pp_out__` Result carrying the cut tensor's TensorInfo.

    Compile-time-folded subtrees (ShapeOf→…→PriorBox chains) are copied
    into every stage that consumes them, like Consts.  Where such a
    subtree reads a runtime tensor from another stage, the read is
    through ShapeOf by construction (value propagation cannot see a
    runtime VALUE any other way), so a zero-Const with the declared
    TensorInfo is an EXACT stand-in — the stage's own shape inference
    reproduces the folded values from it."""
    if model.find_by_type("ReadValue"):
        raise NotImplementedError(
            "pipeline partitioning of stateful networks (ReadValue/Assign) "
            "is not supported — variable state lives in the single-program "
            "state pytree (runtime/compiler.py), which a stage cut would "
            "split across processes"
        )
    if analysis is None:
        from pyopenvino_tpu.passes.shape_infer import infer_shapes

        analysis = infer_shapes(model)
    folded = folded_nodes(model, analysis)
    bounds = [-1] + [c.pos for c in cuts] + [len(rt) - 1]
    # Result nodes ride with their producer (validated into the last stage
    # by find_cut_candidates' result_floor); a Result fed by a FOLDED
    # producer (a statically-known output, e.g. ShapeOf → Result) has no
    # runtime producer stage — it lands in the last stage, whose closure
    # pulls the folded chain in, so the pipelined network returns every
    # output the single-device program does.
    results_by_prod = {}
    folded_results = []
    for r in model.results:
        src, _ = model.in_edges[r.id][0]
        if src in folded:
            folded_results.append(r)
        else:
            results_by_prod.setdefault(src, []).append(r)
    if folded_results and rt:
        results_by_prod.setdefault(rt[-1], []).extend(folded_results)

    fresh = max(model.nodes) + 1
    stages: List[StageSpec] = []
    for s in range(len(bounds) - 1):
        seg_ids = rt[bounds[s] + 1: bounds[s + 1] + 1]
        nodes: Dict[int, Node] = {nid: model.nodes[nid] for nid in seg_ids}
        for nid in seg_ids:
            for r in results_by_prod.get(nid, ()):
                nodes[r.id] = r
        cut_in = cuts[s - 1] if s > 0 else None
        cut_out = cuts[s] if s < len(cuts) else None

        edges: List[Edge] = []
        pp_in_id = fresh
        shape_stub_id = [fresh + 2]  # pp_in/pp_out take fresh, fresh+1

        def close_over(e: Edge, s=s, cut_in=cut_in, nodes=nodes,
                       edges=edges, shape_stub_id=shape_stub_id):
            """Resolve one edge whose dst is in the stage."""
            if e.src in nodes:
                edges.append(e)
                return
            src_node = model.nodes[e.src]
            if src_node.op_type == "Const":
                nodes[e.src] = src_node
                edges.append(e)
            elif e.src in folded:
                nodes[e.src] = src_node
                edges.append(e)
                for port, (up, uport) in sorted(
                    model.in_edges[e.src].items()
                ):
                    close_over(Edge(up, uport, e.src, port))
            elif cut_in and (e.src, e.src_port) == (
                cut_in.node_id, cut_in.port
            ):
                edges.append(Edge(pp_in_id, 0, e.dst, e.dst_port))
            elif e.dst in folded:
                # a folded consumer reading an out-of-stage runtime
                # tensor: shape-only use (see docstring) → zero-Const
                # stand-in with the declared TensorInfo
                info = src_node.outputs[e.src_port]
                sid = shape_stub_id[0]
                shape_stub_id[0] += 1
                nodes[sid] = Node(
                    id=sid, name=f"__pp_shape_{e.src}_{e.src_port}__",
                    op_type="Const", attrs={},
                    inputs={}, outputs={0: info},
                    const=np.zeros(info.shape, info.dtype),
                )
                edges.append(Edge(sid, 0, e.dst, e.dst_port))
            else:
                raise AssertionError(
                    f"stage {s}: edge {e} crosses the cut from a "
                    f"non-articulation node — partition bug"
                )

        initial = set(nodes)  # closure grows `nodes`; folded additions
        for e in model.edges:  # handle their own in-edges recursively
            if e.dst in initial:
                close_over(e)
        if cut_in is not None:
            info = model.nodes[cut_in.node_id].outputs[cut_in.port]
            nodes[pp_in_id] = Node(
                id=pp_in_id, name=PP_IN, op_type="Parameter", attrs={},
                inputs={}, outputs={0: info},
            )
        if cut_out is not None:
            info = model.nodes[cut_out.node_id].outputs[cut_out.port]
            out_id = fresh + 1
            nodes[out_id] = Node(
                id=out_id, name=PP_OUT, op_type="Result", attrs={},
                inputs={0: info}, outputs={},
            )
            edges.append(Edge(cut_out.node_id, cut_out.port, out_id, 0))
        stages.append(
            StageSpec(Model(f"{model.name}_pp{s}", nodes, edges), cut_in, cut_out)
        )
    return stages


# ---------------------------------------------------------------------------
# The pipelined executable
# ---------------------------------------------------------------------------


def _put(host: np.ndarray, sharding):
    """Multi-controller-safe placement — one implementation, in mesh.py."""
    from pyopenvino_tpu.parallel.mesh import put_global

    return put_global(host, sharding)


class PipelinedNetwork:
    """GPipe-microbatched pipeline over `mesh`'s 'stage' axis (DP over its
    'data' axis when present).  Built by `compile_pipelined`."""

    def __init__(self, stage_nets, cuts: List[CutPoint], mesh, model=None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if "stage" not in mesh.shape:
            raise ValueError("pipeline mesh needs a 'stage' axis")
        self.mesh = mesh
        # full prepared model (introspection: serving reads
        # .model.parameters; apps read .model.results)
        self.model = model if model is not None else stage_nets[0].model
        # serving/server.py reads this to round buckets up to multiples of
        # the 'data' axis — same contract as mesh.shard_compiled
        self._batch_pspec = (
            P("data") if "data" in mesh.shape else P(None)
        )
        self.n_stages = mesh.shape["stage"]
        self.data_ax = mesh.shape.get("data", 1)
        if len(stage_nets) != self.n_stages:
            raise ValueError(
                f"{len(stage_nets)} stages vs mesh stage axis {self.n_stages}"
            )
        self.stages = stage_nets
        self.cuts = cuts
        self.input_names = list(stage_nets[0].input_names)
        last = stage_nets[-1]
        self.output_names = list(last.output_names)
        self._out_infos = {
            r.name: r.inputs[0] for r in last.model.results
        }
        # flat activation ring capacity: the largest cut tensor
        self._act_elems = max(c.size for c in cuts) if cuts else 1

        # ---- pack per-stage weight pytrees into per-dtype (K, L) buffers --
        self._layouts: List[Dict[str, Tuple[str, int, int, Tuple[int, ...]]]] = []
        lens: Dict[str, int] = {}
        dtypes: Dict[str, np.dtype] = {}
        for net in self.stages:
            off: Dict[str, int] = {}
            lay = {}
            for key in sorted(net.weights):
                arr = np.asarray(net.weights[key])
                dt = str(arr.dtype)
                dtypes[dt] = arr.dtype
                o = off.get(dt, 0)
                lay[key] = (dt, o, arr.size, arr.shape)
                off[dt] = o + arr.size
            self._layouts.append(lay)
            for dt, n in off.items():
                lens[dt] = max(lens.get(dt, 0), n)
        self._wbufs = {}
        for dt, L in sorted(lens.items()):
            buf = np.zeros((self.n_stages, L), dtype=dtypes[dt])
            for s, net in enumerate(self.stages):
                for key, (d, o, size, _) in self._layouts[s].items():
                    if d == dt:
                        buf[s, o:o + size] = np.asarray(
                            net.weights[key]
                        ).reshape(-1)
            self._wbufs[dt] = _put(buf, NamedSharding(mesh, P("stage", None)))
        self._jit_cache: Dict[Tuple[int, int], object] = {}

    # -- program construction ------------------------------------------------

    def _unflatten(self, s: int, wbufs):
        lay = self._layouts[s]
        return {
            key: wbufs[dt][0, off:off + size].reshape(shape)
            for key, (dt, off, size, shape) in lay.items()
        }

    def _make_branch(self, s: int, m_local: int, out_elems: int):
        import jax
        import jax.numpy as jnp

        net = self.stages[s]
        param_infos = {
            n.name: n.outputs[n.out_port] for n in net.model.parameters
        }
        fn = net._fn
        last = s == self.n_stages - 1
        in_elems = self.cuts[s - 1].size if s > 0 else 0

        def single(w, example):
            ins = {
                name: example[name].reshape(param_infos[name].shape)
                for name in example
            }
            return fn(w, ins)

        axes = tuple(self.mesh.axis_names)

        def branch(act, xt, wbufs):
            from jax import lax

            w = self._unflatten(s, wbufs)
            if s == 0:
                ins = {name: xt[name] for name in param_infos}
            else:
                ins = {PP_IN: act[:, :in_elems]}
            outs = jax.vmap(single, in_axes=(None, 0))(w, ins)
            if last:
                parts = [
                    outs[name].reshape(m_local, -1).astype(jnp.float32)
                    for name in self.output_names
                ]
                contrib = jnp.concatenate(parts, axis=1)
                pad = out_elems - contrib.shape[1]
                if pad:
                    contrib = jnp.pad(contrib, ((0, 0), (0, pad)))
                # the VMA checker requires all switch branches to agree on
                # the varying-axis type; the computed output is varying over
                # the whole mesh (weights are 'stage'-sharded, inputs
                # 'data'-sharded), so the literal-zeros side must be cast
                act_next = lax.pcast(
                    jnp.zeros((m_local, self._act_elems), jnp.float32),
                    axes, to="varying",
                )
            else:
                o = outs[PP_OUT].reshape(m_local, -1).astype(jnp.float32)
                pad = self._act_elems - o.shape[1]
                act_next = jnp.pad(o, ((0, 0), (0, pad))) if pad else o
                contrib = lax.pcast(
                    jnp.zeros((m_local, out_elems), jnp.float32),
                    axes, to="varying",
                )
            return act_next, contrib

        return branch

    def _build(self, m_local: int, n_micro: int):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax.sharding import PartitionSpec as P

        K = self.n_stages
        out_elems = sum(
            int(np.prod(info.shape)) for info in self._out_infos.values()
        ) or 1
        branches = [
            self._make_branch(s, m_local, out_elems) for s in range(K)
        ]

        def pp_fn(wbufs, x):
            stage = lax.axis_index("stage")
            is_last = stage == K - 1

            def tick(t, carry):
                act, outbuf = carry
                ti = jnp.minimum(t, n_micro - 1)
                xt = {
                    name: lax.dynamic_index_in_dim(
                        x[name], ti, axis=0, keepdims=False
                    )
                    for name in x
                }
                act_new, contrib = lax.switch(stage, branches, act, xt, wbufs)
                oi = jnp.clip(t - (K - 1), 0, n_micro - 1)
                valid = jnp.logical_and(t >= K - 1, is_last)
                cur = lax.dynamic_slice_in_dim(outbuf, oi, 1, axis=0)[0]
                upd = jnp.where(valid, contrib, cur)
                outbuf = lax.dynamic_update_slice_in_dim(
                    outbuf, upd[None], oi, axis=0
                )
                if K > 1:
                    act = lax.ppermute(
                        act_new, "stage",
                        [(i, i + 1) for i in range(K - 1)],
                    )
                else:
                    act = act_new
                return act, outbuf

            axes = tuple(self.mesh.axis_names)
            act0 = lax.pcast(
                jnp.zeros((m_local, self._act_elems), jnp.float32),
                axes, to="varying",
            )
            out0 = lax.pcast(
                jnp.zeros((n_micro, m_local, out_elems), jnp.float32),
                axes, to="varying",
            )
            _, outbuf = lax.fori_loop(0, n_micro + K - 1, tick, (act0, out0))
            return lax.psum(outbuf, "stage")

        w_specs = {dt: P("stage", None) for dt in self._wbufs}
        has_data = "data" in self.mesh.shape
        x_spec = P(None, "data") if has_data else P()
        x_specs = {name: x_spec for name in self.input_names}
        return jax.jit(
            jax.shard_map(
                pp_fn,
                mesh=self.mesh,
                in_specs=(w_specs, x_specs),
                out_specs=P(None, "data", None) if has_data else P(),
            )
        )

    # -- execution -------------------------------------------------------------

    def _pick_n_micro(self, batch: int) -> int:
        """Largest microbatch count ≤ 2·n_stages (a full pipeline plus one
        refill — bubble fraction (K-1)/(n_micro+K-1)) that divides the batch
        into 'data'-shardable microbatches."""
        for n in range(min(2 * self.n_stages, batch), 0, -1):
            if batch % n == 0 and (batch // n) % self.data_ax == 0:
                return n
        raise ValueError(
            f"batch {batch} cannot be split into microbatches shardable "
            f"over data={self.data_ax}"
        )

    def infer_batch(
        self, inputs: Dict[str, np.ndarray], n_micro: Optional[int] = None
    ):
        """inputs: {name: (B, ...)} with the declared batch=1 dim dropped;
        returns {result_name: (B, ...)} like CompiledNetwork.infer_batch."""
        batch = int(next(iter(inputs.values())).shape[0])
        if n_micro is None:
            n_micro = self._pick_n_micro(batch)
        if batch % n_micro or (batch // n_micro) % self.data_ax:
            raise ValueError(
                f"batch {batch} not divisible into {n_micro} microbatches "
                f"over data={self.data_ax}"
            )
        m = batch // n_micro
        key = (m // self.data_ax, n_micro)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(*key)
        x = {
            name: np.asarray(v).reshape((n_micro, m) + v.shape[1:])
            for name, v in inputs.items()
        }
        import jax

        if jax.process_count() > 1:
            # multi-controller: jit needs committed global arrays.  Every
            # process passes the SAME full batch (the pipeline contract in
            # a multi-process group — the 'stage' axis crosses processes,
            # inputs are replicated along it).
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = (
                P(None, "data") if "data" in self.mesh.shape else P()
            )
            x = {
                name: _put(v, NamedSharding(self.mesh, spec))
                for name, v in x.items()
            }
        flat = np.asarray(self._jit_cache[key](self._wbufs, x))
        flat = flat.reshape(batch, -1)
        out = {}
        off = 0
        for name in self.output_names:
            info = self._out_infos[name]
            size = int(np.prod(info.shape))
            # collapse the declared unit batch dim like batched_fn does;
            # outputs with no unit batch (ShapeOf → Result) keep their
            # declared shape per example
            per = (
                info.shape[1:]
                if len(info.shape) > 0 and info.shape[0] == 1
                else tuple(info.shape)
            )
            arr = flat[:, off:off + size].reshape((batch,) + per)
            out[name] = arr.astype(info.dtype)
            off += size
        return out


def compile_pipelined(
    model: Model,
    mesh,
    config: Optional[Config] = None,
    calibration_samples=None,
) -> PipelinedNetwork:
    """Partition `model` into mesh.shape['stage'] balanced stages and build
    the SPMD pipelined executable (see module docstring)."""
    from pyopenvino_tpu.passes.shape_infer import infer_shapes
    from pyopenvino_tpu.runtime.compiler import CompiledNetwork, prepare_model

    config = config or Config()
    model, quantized, act_scales, bias_corr = prepare_model(
        model, config, calibration_samples
    )
    analysis = infer_shapes(model)
    n_stages = mesh.shape["stage"]
    rt, cuts = choose_cuts(model, analysis, n_stages)
    specs = partition(model, rt, cuts, analysis=analysis)
    nets = [
        CompiledNetwork(
            spec.model, config, quantized=quantized,
            act_scales=act_scales, bias_corr=bias_corr,
        )
        for spec in specs
    ]
    return PipelinedNetwork(nets, cuts, mesh, model=model)


def build_pipeline_mesh(n_stages: int, data: int = 1):
    """Mesh(('data','stage')) over the first data*n_stages devices, 'stage'
    minor so CONSECUTIVE STAGES sit on adjacent (ICI-near) chips — the
    ppermute activation ring is the latency-sensitive traffic; a stage's
    'data' replicas are stride-n_stages apart and never communicate."""
    import jax
    from jax.sharding import Mesh

    n = data * n_stages
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"pipeline mesh needs {n} devices, have {len(devices)}")
    dev = np.array(devices[:n]).reshape(data, n_stages)
    return Mesh(dev, ("data", "stage"))
