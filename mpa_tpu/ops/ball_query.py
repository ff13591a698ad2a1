"""Radius (ball) grouping.

Reference semantics: ``query_ball_point`` (modules/pointnet2_utils.py:112-134)
and the missing CUDA twin (SURVEY.md §2.2): for each query centre take the first
``nsample`` base points (by original index order) whose squared distance is
within ``radius^2``; slots with no in-radius point are backfilled with the
first in-radius hit.

TPU design: instead of sorting the full N axis like the reference, mark each
base point with its own index where in-radius else sentinel N, then take the
``nsample`` smallest via ``lax.top_k`` on the negation — O(N log nsample)
selection, identical output ordering (ascending index among in-radius points).
On TPU above a size threshold, a fused Pallas kernel replaces even that:
XLA lowers this top_k to a full sort along N (profiled at 7.35 ms/step on
repsurf_ssg_2x — its largest single op), while the kernel fuses the MXU
distance tile with iterative min-pass selection in VMEM
(ops/pallas/ball_pallas.py) and never materializes [B, S, N] in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpa_tpu.ops.pairwise import square_distance


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """Group up to ``nsample`` base points within ``radius`` of each centre.

    Args:
      radius: grouping radius (static).
      nsample: group size (static).
      xyz: ``[B, N, 3]`` base points.
      new_xyz: ``[B, S, 3]`` query centres.

    Returns:
      ``[B, S, nsample]`` int32 indices into N; empty slots repeat the first
      in-radius index (reference backfill semantics). If a centre has no
      in-radius point at all (cannot happen when centres are a subset of the
      base set), slot 0 of the base set is returned.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if (
        jax.default_backend() == "tpu"
        and S * N >= 30_000  # same crossover family as ops.knn's dispatch
        and nsample <= 64
    ):
        from mpa_tpu.ops.pallas.ball_pallas import ball_query_indices_pallas

        group_idx = ball_query_indices_pallas(float(radius), nsample, xyz, new_xyz)
    else:
        d = square_distance(new_xyz, xyz)  # [B, S, N]
        arange = jnp.arange(N, dtype=jnp.int32)[None, None, :]
        marked = jnp.where(d <= radius * radius, arange, N)  # [B, S, N]
        neg_topk, _ = jax.lax.top_k(-marked, nsample)  # ascending index order
        group_idx = -neg_topk  # [B, S, nsample], sentinel N where not enough
    first = group_idx[..., :1]  # first (smallest-index) in-radius hit
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # Degenerate all-empty centre: first is still the sentinel; clamp to 0.
    return jnp.where(group_idx == N, 0, group_idx).astype(jnp.int32)
