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
