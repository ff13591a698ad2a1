"""Profiling hooks: jax.profiler traces, parameter counts, FLOP estimates.

The reference imports thop but never calls it live
(tool/train_cls_scanobjectnn.py:24 — SURVEY.md §5); here tracing and cost
reports are first-class.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def count_params(params: Any) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def estimate_flops(fn, *args) -> float:
    """XLA cost-analysis FLOPs of a jitted callable on example args."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0)) if cost else -1.0


# ---------------------------------------------------------------------------
# Trace parsing (op-level breakdown)
#
# The image's tensorboard_plugin_profile is binary-incompatible with its
# TensorFlow, so traces are parsed directly: utils/xplane.proto is a minimal
# field-number-compatible mirror of tsl's XSpace schema (unknown fields skip
# per protobuf wire rules), compiled to utils/xplane_pb2.py.
# ---------------------------------------------------------------------------


def load_xspace(trace_dir: str):
    """Parse the newest .xplane.pb under ``trace_dir`` into an XSpace."""
    import glob
    import os

    from mpa_tpu.utils import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def op_breakdown(trace_dir: str, device_prefix: str = "/device:"):
    """Per-op self-time breakdown of a captured trace.

    Returns ``(total_ms, rows)`` where rows are
    ``{"name", "category", "ms", "count", "source"}`` sorted by time
    descending, aggregated over every line of the first matching device
    plane (XLA op events). ``ms`` sums ALL occurrences in the trace — divide
    by your step count for per-step numbers.
    """
    xs = load_xspace(trace_dir)
    planes = [p for p in xs.planes if p.name.startswith(device_prefix) and p.lines]
    if not planes:
        raise ValueError(
            f"no device plane under {device_prefix!r}; planes: "
            f"{[p.name for p in xs.planes]}"
        )
    plane = planes[0]
    smeta = {k: v.name for k, v in plane.stat_metadata.items()}
    agg: dict = {}
    total_ps = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for e in line.events:
            md = plane.event_metadata[e.metadata_id]
            cat = src = None
            for s in md.stats:
                key = smeta.get(s.metadata_id)
                if key == "hlo_category":
                    cat = s.str_value
                elif key == "source":
                    src = s.str_value
            name = md.name.split(" ")[0]
            row = agg.setdefault(
                name, {"name": name, "category": cat or "?", "ms": 0.0,
                       "count": 0, "source": src or ""}
            )
            row["ms"] += e.duration_ps / 1e9
            row["count"] += 1
            total_ps += e.duration_ps
    rows = sorted(agg.values(), key=lambda r: -r["ms"])
    return total_ps / 1e9, rows


def category_breakdown(trace_dir: str, device_prefix: str = "/device:"):
    """Like op_breakdown but grouped by HLO category -> (total_ms, rows)."""
    total_ms, rows = op_breakdown(trace_dir, device_prefix)
    cats: dict = {}
    for r in rows:
        c = cats.setdefault(r["category"], {"category": r["category"], "ms": 0.0, "count": 0})
        c["ms"] += r["ms"]
        c["count"] += r["count"]
    return total_ms, sorted(cats.values(), key=lambda r: -r["ms"])
