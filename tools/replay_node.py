"""Single-op fixture replay — the reference's test_node_sample.py workflow.

The reference dumps (node, inputs) pickles mid-run via the pickle_node_args
hook and replays them against one plugin's compute() offline
(reference: inference_engine.py:216,275-278; test_node_sample.py:6-14).
Here the Interpreter's capture_node_args hook produces the fixtures and this
tool replays them through BOTH the numpy op and the JAX emit path,
cross-checking the two — a per-op differential test from live traffic.

Usage:
    # capture: run any model with node ids to capture
    python tools/replay_node.py capture --model mnist --nodes 2 4 \
        --out /tmp/fixtures.pkl
    # replay: cross-check numpy vs jax for every captured op
    python tools/replay_node.py replay /tmp/fixtures.pkl
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _model_paths


def capture(args):
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.runtime.interpreter import Interpreter

    xml, binp = _model_paths(args.model)
    model = read_ir_model(xml, binp)
    it = Interpreter(model)
    it.capture_node_args = list(args.nodes)

    param = model.parameters[0]
    shape = param.outputs[param.out_port].shape
    rng = np.random.default_rng(0)
    blob = rng.uniform(0, 255, shape).astype(np.float32)
    it.run({param.name: blob})

    fixtures = [
        {"op_type": node.op_type, "name": node.name, "attrs": dict(node.attrs),
         "node": node, "inputs": inputs}
        for node, inputs in it.captured
    ]
    with open(args.out, "wb") as f:
        pickle.dump(fixtures, f)
    print(f"captured {len(fixtures)} fixtures -> {args.out}")
    for fx in fixtures:
        print(f"  {fx['op_type']} {fx['name']!r} "
              f"inputs={ {p: v.shape for p, v in fx['inputs'].items()} }")


def replay(args):
    import jax.numpy as jnp

    from pyopenvino_tpu.config import Config
    from pyopenvino_tpu.ops import get_op
    from pyopenvino_tpu.ops.spec import TValue

    with open(args.path, "rb") as f:
        fixtures = pickle.load(f)

    class _Ctx:
        """Mirrors the EmitCtx surface (runtime/compiler.py:52) — every
        member an op's ``emit`` may read must exist here, else replay
        reports a spurious 'emit failed' for that op class."""

        config = Config()
        use_pallas = False
        full_int8 = False
        # fixtures replay on CPU; Pallas routes (if any) use interpret mode
        pallas_interpret = True

        def __init__(self, inputs):
            self._inputs = inputs

        @property
        def compute_dtype(self):
            return jnp.float32

        def weight_for(self, node, tv):
            return tv.arr

        def act_scale(self, node):
            return None

        def out_int8_scale(self, node):
            return None

        def static_value(self, node, port):
            # The capture recorded the actual runtime value of every input
            # port, which for shape-op operands IS the compile-time const.
            return np.asarray(self._inputs[port])

    failures = 0
    for fx in fixtures:
        node, inputs = fx["node"], fx["inputs"]
        op = get_op(node.op_type)
        ref = op.ref_compute(node, inputs)
        try:
            tvs = {p: TValue(jnp.asarray(v), "L") for p, v in inputs.items()}
            jax_out = op.emit(_Ctx(inputs), node, tvs)
            for port in ref:
                got = np.asarray(jax_out[port].nchw()
                                 if len(ref[port].shape) == 4
                                 else jax_out[port].arr)
                ok = np.allclose(got, ref[port], rtol=1e-3, atol=1e-4)
                print(f"{node.op_type} {node.name!r} port {port}: "
                      f"{'MATCH' if ok else 'MISMATCH'}")
                failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001
            print(f"{node.op_type} {node.name!r}: emit failed ({e})")
            failures += 1
    sys.exit(1 if failures else 0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("capture")
    c.add_argument("--model", default="mnist")
    c.add_argument("--nodes", type=int, nargs="+", required=True)
    c.add_argument("--out", default="/tmp/node_fixtures.pkl")
    r = sub.add_parser("replay")
    r.add_argument("path")
    args = ap.parse_args()

    from pyopenvino_tpu.utils import force_cpu

    force_cpu()
    if args.cmd == "capture":
        capture(args)
    else:
        replay(args)


if __name__ == "__main__":
    main()
