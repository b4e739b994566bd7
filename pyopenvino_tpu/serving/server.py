"""Continuous-batching inference server.

Design (TPU-first):
  * requests land in a thread-safe queue as (inputs, Future) pairs;
  * one scheduler thread drains the queue, coalesces up to the largest
    configured bucket, pads the batch to the bucket size (padding examples
    are masked out of the responses) and calls the compiled network's
    per-bucket jitted function — so the jit cache holds exactly
    len(buckets) entries per network and steady-state serving never
    recompiles (SURVEY.md §7 hard part 5);
  * a small admission delay lets concurrent callers coalesce into one
    device launch instead of N singleton launches — the continuous-batching
    analogue of the reference's one-blocking-infer-per-GUI-tick loop
    (draw-and-infer.py:54-76);
  * batches ride the leading axis, so a data-parallel mesh
    (parallel/mesh.py shard_compiled) shards them over chips with zero code
    changes here.

Latency accounting distinguishes queue wait from device time; stats expose
p50/p99 and throughput for the BASELINE.md report points.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    padded_slots: int = 0
    # rolling window so a long-running server doesn't grow unboundedly
    latencies_ms: "deque" = dataclasses.field(
        default_factory=lambda: deque(maxlen=100_000)
    )

    def _snapshot(self) -> list:
        # the scheduler thread appends concurrently; list() on a mutating
        # deque can raise, so snapshot with a bounded retry
        for _ in range(8):
            try:
                return list(self.latencies_ms)
            except RuntimeError:
                continue
        return []

    def percentile(self, p: float) -> float:
        snap = self._snapshot()
        if not snap:
            return 0.0
        return float(np.percentile(np.asarray(snap), p))

    @property
    def p50_ms(self) -> float:
        return self.percentile(50)

    @property
    def p99_ms(self) -> float:
        return self.percentile(99)

    def summary(self) -> Dict[str, float]:
        # one snapshot for both percentiles: consistent pair, half the
        # copy/sort work of two independent property reads
        snap = self._snapshot()
        p50, p99 = (
            (float(x) for x in np.percentile(np.asarray(snap), [50, 99]))
            if snap else (0.0, 0.0)
        )
        return {
            "requests": self.requests,
            "batches": self.batches,
            "padded_slots": self.padded_slots,
            "p50_ms": round(p50, 3),
            "p99_ms": round(p99, 3),
        }


class InferenceServer:
    """Continuous batching over a CompiledNetwork.

    Parameters
    ----------
    compiled : CompiledNetwork  (runtime/compiler.py)
    buckets  : ascending batch sizes; requests are padded up to the
               smallest bucket that fits the pending count.
    max_delay_ms : admission window — how long the scheduler waits for
               more requests before launching a partial batch.
    """

    def __init__(
        self,
        compiled,
        buckets: Sequence[int] = (1, 2, 4, 8, 16, 32),
        max_delay_ms: float = 2.0,
        resolutions: Optional[Sequence[Tuple[int, int]]] = None,
    ):
        self.compiled = compiled
        buckets = sorted(buckets)
        # Data-parallel mesh attached (parallel/mesh.py shard_compiled):
        # jit shards the leading batch axis P('data'), so every bucket must
        # be divisible by the data axis — round buckets up to multiples of
        # it (a batch of 1 on a data=4 mesh pads to 4; the padded slots are
        # masked out of responses like any other padding).
        mesh = getattr(compiled, "mesh", None)
        pspec = getattr(compiled, "_batch_pspec", None)
        if mesh is not None and pspec is not None:
            data_ax = int(np.prod([
                mesh.shape[ax] for ax in (pspec[0] if isinstance(
                    pspec[0], tuple) else (pspec[0],)) if ax is not None
            ])) if len(pspec) else 1
            buckets = sorted({
                max(data_ax, -(-b // data_ax) * data_ax) for b in buckets
            })
        self.buckets = tuple(buckets)
        self.max_delay_s = max_delay_ms / 1e3
        self.stats = ServerStats()
        self._queue: "queue.Queue[Optional[Tuple[dict, Future, float]]]" = (
            queue.Queue()
        )
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._lock = threading.Lock()

        self._param_names = [n.name for n in compiled.model.parameters]
        self._param_shapes = {
            n.name: tuple(n.outputs[n.out_port].shape)
            for n in compiled.model.parameters
        }

        # Dynamic-resolution serving: one reshaped CompiledNetwork per
        # extra (H, W), sharing the prepared model's quantization state —
        # reshape_model re-runs shape inference, so shape-derived
        # constants (SSD's ShapeOf → PriorBox anchor chains) RE-FOLD at
        # each resolution.  Requests route by their input shape; the jit
        # cache is keyed (resolution, bucket) and the scheduler batches
        # only same-resolution requests together (OV 2.0 partial-shapes
        # story served from len(resolutions) static programs).
        self._nets: Dict[Optional[Tuple[int, int]], object] = {
            None: compiled}
        self._shapes_by_key = {None: self._param_shapes}
        if resolutions:
            if getattr(compiled, "mesh", None) is not None:
                raise NotImplementedError(
                    "resolutions with a sharded network: re-attach the "
                    "mesh per variant is not wired up — serve one "
                    "resolution per sharded server")
            params = compiled.model.parameters
            if len(params) != 1 or len(
                    params[0].outputs[params[0].out_port].shape) != 4:
                raise NotImplementedError(
                    "resolutions need exactly one rank-4 image input")
            from pyopenvino_tpu.passes.shape_infer import reshape_model
            from pyopenvino_tpu.runtime.compiler import CompiledNetwork

            p = params[0]
            b0, c0, h0, w0 = p.outputs[p.out_port].shape
            for h, w in resolutions:
                key = (int(h), int(w))
                if key == (h0, w0) or key in self._nets:
                    continue
                m2 = reshape_model(
                    compiled.model, {p.name: (b0, c0, h, w)})
                self._nets[key] = CompiledNetwork(
                    m2, compiled.config,
                    quantized=compiled._quantized,
                    act_scales=compiled.act_scales,
                    bias_corr=compiled._bias_corr,
                )
                self._shapes_by_key[key] = {
                    n.name: tuple(n.outputs[n.out_port].shape)
                    for n in m2.parameters
                }

    # -- lifecycle -----------------------------------------------------------

    def start(self, warmup: bool = False) -> "InferenceServer":
        """With ``warmup``, compile every batch bucket before accepting
        traffic — otherwise the first request landing in a cold bucket
        pays the full jit compile inside its latency (observed: a 30 s
        compile inside a 10 s load test wrecks every percentile)."""
        if warmup:
            self.warmup_buckets()
        with self._lock:
            if self._running:
                return self
            if self._thread is not None and self._thread.is_alive():
                # previous scheduler still draining (e.g. stop() timed out
                # mid-compile) — a second thread would race it on the queue
                raise RuntimeError(
                    "previous scheduler thread still stopping; retry stop()"
                )
            self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def warmup_buckets(self):
        """Run one dummy batch through every (resolution, bucket) cell
        (compiles + caches each jit entry)."""
        # dummies carry each Parameter's DECLARED dtype: warming with the
        # wrong dtype caches a jit entry the first real request misses,
        # paying the cold compile in-band — the exact cost warmup avoids
        for key, net in self._nets.items():
            dummy = {
                n.name: np.zeros(
                    (1,) + tuple(n.outputs[n.out_port].shape),
                    n.outputs[n.out_port].dtype,
                )
                for n in net.model.parameters
            }
            for b in self.buckets:
                batch = {
                    k: np.repeat(v, b, axis=0) for k, v in dummy.items()
                }
                out = net.infer_batch(batch)
                # host-fetch barrier (block_until_ready is unreliable
                # through the remote-TPU tunnel)
                k = next(iter(out))
                np.asarray(out[k]).ravel()[:1]

    def stop(self):
        with self._lock:
            if not self._running:
                return
            self._running = False
        self._queue.put(None)  # wake the scheduler
        if self._thread is not None:
            self._thread.join(timeout=30)
            if self._thread.is_alive():
                # still mid-batch (e.g. a cold jit compile) — keep the
                # handle so start() refuses to race it (see start())
                return
            self._thread = None
        self._fail_orphans()

    def _fail_orphans(self):
        """Fail any request that slipped into the queue during shutdown
        (submit() raced the _running flip) — its caller would otherwise
        block on the Future forever."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is None:
                continue
            fut = item[1]
            if not fut.done():
                fut.set_exception(RuntimeError("server stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- client API ----------------------------------------------------------

    def submit(self, inputs: Dict[str, np.ndarray]) -> Future:
        """Enqueue one request (per-example shapes, no batch dim needed
        beyond the declared batch=1). Returns a Future resolving to
        {result_name: ndarray}."""
        if not self._running:
            raise RuntimeError("server not started")
        # validate HERE, in the caller's thread: a malformed request that
        # reaches the scheduler fails the whole coalesced batch it landed
        # in, taking innocent concurrent requests down with it.  With
        # dynamic resolutions the request routes to the variant whose
        # declared shapes it matches.
        key = self._route(inputs)
        fut: Future = Future()
        self._queue.put((inputs, fut, time.perf_counter(), key))
        return fut

    def _route(self, inputs: Dict[str, np.ndarray]):
        last_err = None
        for key, shapes in self._shapes_by_key.items():
            ok = True
            for name, shape in shapes.items():
                if name not in inputs:
                    raise KeyError(f"missing input {name!r}")
                if tuple(np.asarray(inputs[name]).shape) != shape:
                    got = tuple(np.asarray(inputs[name]).shape)
                    last_err = (f"input {name!r}: shape {got} != "
                                f"declared {shape}")
                    ok = False
                    break
            if ok:
                return key
        served = sorted(
            str(s) for shapes in self._shapes_by_key.values()
            for s in shapes.values())
        raise ValueError(
            f"{last_err} (served shapes: {', '.join(served)})")

    def infer(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return self.submit(inputs).result()

    # -- scheduler -----------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _collect(self) -> List[Tuple[dict, Future, float]]:
        """Block for the first request, then coalesce within the admission
        window up to the largest bucket."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_delay_s
        max_b = self.buckets[-1]
        while len(batch) < max_b:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # keep the shutdown signal
                break
            batch.append(item)
        return batch

    def _loop(self):
        while True:
            items = self._collect()
            if not items:
                if not self._running:
                    return
                continue
            # group by resolution: only same-shape requests share a
            # device launch (each key has its own compiled program)
            groups: Dict[object, list] = {}
            for item in items:
                groups.setdefault(item[3], []).append(item)
            for key, group in groups.items():
                try:
                    self._run_batch(group, key)
                except Exception as e:  # noqa: BLE001 — propagate
                    for _, fut, _, _ in group:
                        if not fut.done():
                            fut.set_exception(e)
            if not self._running and self._queue.empty():
                return

    def _run_batch(self, items, key=None):
        n = len(items)
        bucket = self._bucket_for(n)

        stacked: Dict[str, np.ndarray] = {}
        for name in self._param_names:
            arrs = [np.asarray(inputs[name]) for inputs, _, _, _ in items]
            block = np.stack(arrs, axis=0)
            if bucket > n:  # pad with copies of the last example (masked out)
                pad = np.repeat(block[-1:], bucket - n, axis=0)
                block = np.concatenate([block, pad], axis=0)
            stacked[name] = block

        out = self._nets[key].infer_batch(stacked)

        for i, (_, fut, t_enq, _) in enumerate(items):
            # restore the declared batch=1 leading dim per example, so a
            # server result looks exactly like a direct infer() result
            result = {k: np.asarray(v[i])[None] for k, v in out.items()}
            if not fut.done():
                fut.set_result(result)
            self.stats.latencies_ms.append(
                (time.perf_counter() - t_enq) * 1e3
            )
        self.stats.requests += n
        self.stats.batches += 1
        self.stats.padded_slots += bucket - n
