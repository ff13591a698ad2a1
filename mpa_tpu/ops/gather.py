"""Batched gathers — TPU equivalents of the reference's ``index_points`` /
``resort_points`` (modules/pointnet2_utils.py:64-81, :289-307) and of the missing
CUDA ``index_points(points, idx, cuda=, is_group=)`` (SURVEY.md §2.2).

Implemented with ``jnp.take_along_axis`` so XLA lowers them to fused dynamic
gathers that can melt into consumer ops instead of materializing index loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by per-batch indices.

    Args:
      points: ``[B, N, C]``.
      idx: integer indices ``[B, S]`` or ``[B, S, K]`` (or deeper: any
        ``[B, *group_dims]``), values in ``[0, N)``.

    Returns:
      ``[B, S, C]`` / ``[B, S, K, C]`` / ``[B, *group_dims, C]`` gathered points.
    """
    B, N, C = points.shape
    if jnp.issubdtype(points.dtype, jnp.floating):
        # Same forward; the VJP's scatter-add runs as a Pallas one-hot matmul
        # at scale (XLA scatter-adds were the largest backward kernels in the
        # part-seg profile).
        from mpa_tpu.ops.pallas.gather_pallas import gather_neighbors

        return gather_neighbors(points, idx)
    group_shape = idx.shape[1:]
    flat_idx = idx.reshape(B, -1)  # [B, S*K*...]
    gathered = jnp.take_along_axis(
        points, flat_idx[..., None], axis=1, mode="promise_in_bounds"
    )
    return gathered.reshape((B,) + group_shape + (C,))


def mod_index(
    base: jnp.ndarray, mod_idx: jnp.ndarray, values: jnp.ndarray
) -> jnp.ndarray:
    """Masked scatter-replace: rows of ``base [B, N, D]`` at per-batch indices
    ``mod_idx [B, M]`` are replaced by ``values [B, M, D]`` (reference
    ``mod_index``, modules/pointnet2_utils.py:53-61; dead in live paths).
    Implemented as a batched functional scatter — no in-place mutation."""

    def one(b, idx, val):
        return b.at[idx].set(val)

    return jax.vmap(one)(base, mod_idx, values)


def resort_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Reorder the group dim of ``[B, N, G, C]`` by a per-(B, N) permutation.

    Used to sort umbrella neighbours by azimuth
    (reference: modules/pointnet2_utils.py:289-307).

    Args:
      points: ``[B, N, G, C]``.
      idx: ``[B, N, G]`` permutation of ``range(G)`` per (batch, point).

    Returns:
      ``[B, N, G, C]`` with the G axis permuted per (B, N).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=2, mode="promise_in_bounds")
