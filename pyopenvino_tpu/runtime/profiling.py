"""Measured per-op profiling of the compiled path.

The reference prints per-node wall-clock from its Python dispatch loop
(reference: inference_engine.py:273-283).  The compiled path runs the whole
graph as ONE XLA executable, so per-op cost must come from the device
profiler instead: ``jax.profiler.trace`` captures an XSpace, and the
``hlo_stats`` tool (xprof) yields measured per-HLO-op time, FLOP/s, memory
bandwidth and the bound-by classification (Compute / HBM / VMEM) — strictly
more than the reference's wall-clock, and true fusion-aware device time
rather than Python dispatch overhead.

Node attribution: runtime/compiler.py wraps every op emission in
``jax.named_scope("<OpType>_<node id>")``; XLA propagates those scopes into
each HLO op's metadata, which hlo_stats surfaces as the "Framework op name"
column.  Fused HLO ops carry one representative scope, so per-node numbers
are attribution-approximate under fusion while per-category totals are
exact device time.
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional

_COLS = {
    "HLO op category": "category",
    "HLO op name": "hlo_op",
    "Framework op name": "framework_op",
    "#Occurrences": "occurrences",
    "Total self time (us)": "self_us",
    "Avg. self time (us)": "avg_self_us",
    "Model GFLOP/s": "gflops",
    "Measured memory BW (GiB/s)": "mem_bw_gibs",
    "Operational intensity (FLOPS/Byte)": "intensity",
    "Bound by": "bound_by",
}

_SCOPE_RE = re.compile(r"([A-Za-z]+)_(\d+)")


def parse_hlo_stats(trace_dir: str) -> List[Dict]:
    """Parse the hlo_stats tool output of the newest profile under
    ``trace_dir`` into a list of row dicts (keys: _COLS values)."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # xprof not installed — profiling unavailable
        return []
    import json

    runs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*")))
    if not runs:
        return []
    files = glob.glob(os.path.join(runs[-1], "*.xplane.pb"))
    if not files:
        return []
    try:
        data, _ctype = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    except Exception:  # noqa: BLE001 — backend without hlo_stats support
        return []
    obj = json.loads(data.decode() if isinstance(data, bytes) else data)
    labels = [c["label"] for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        vals = [c.get("v") for c in r["c"]]
        row = {}
        for label, v in zip(labels, vals):
            key = _COLS.get(label)
            if key:
                row[key] = v
        rows.append(row)
    return rows


def node_scope(row: Dict) -> Optional[str]:
    """'<OpType>_<id>' named scope embedded in the framework op name."""
    m = _SCOPE_RE.search(row.get("framework_op") or "")
    return m.group(0) if m else None


def aggregate(rows: List[Dict], by: str = "category") -> List[Dict]:
    """Aggregate rows by 'category' or 'node' (named scope); returns
    descending by total self time with a percent column."""
    groups: Dict[str, Dict] = defaultdict(
        lambda: {"self_us": 0.0, "occurrences": 0, "rows": 0}
    )
    for row in rows:
        key = row.get("category") if by == "category" else node_scope(row)
        if key is None:
            key = "(unattributed)"
        g = groups[key]
        g["self_us"] += float(row.get("self_us") or 0.0)
        g["occurrences"] += int(row.get("occurrences") or 0)
        g["rows"] += 1
        bb = row.get("bound_by")
        if bb:
            g.setdefault("bound_by", defaultdict(float))[bb] += float(
                row.get("self_us") or 0.0
            )
    total = sum(g["self_us"] for g in groups.values()) or 1.0
    out = []
    for key, g in sorted(groups.items(), key=lambda kv: -kv[1]["self_us"]):
        bound = ""
        if "bound_by" in g:
            bound = max(g["bound_by"].items(), key=lambda kv: kv[1])[0]
        out.append({
            by: key,
            "self_us": round(g["self_us"], 2),
            "pct": round(100.0 * g["self_us"] / total, 2),
            "occurrences": g["occurrences"],
            "bound_by": bound,
        })
    return out


def format_table(agg_rows: List[Dict], by: str = "category") -> str:
    lines = [f"{by:<36} {'self µs':>12} {'%':>7} {'occurs':>8}  bound by"]
    for r in agg_rows:
        lines.append(
            f"{str(r[by]):<36} {r['self_us']:>12.1f} {r['pct']:>7.2f} "
            f"{r['occurrences']:>8}  {r.get('bound_by', '')}"
        )
    return "\n".join(lines)
