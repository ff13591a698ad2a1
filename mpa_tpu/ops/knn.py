"""k-nearest-neighbour query.

Reference semantics: ``knn_point`` (modules/pointnet2_utils.py:211-222) — full
pairwise distance then ``topk(largest=False, sorted=True)`` — and the missing
CUDA ``query_knn_point`` (idx-only variant, SURVEY.md §2.2).

TPU design: distances via one MXU einsum; selection via ``lax.top_k`` on the
negated distances (top_k returns descending order, so negation yields
ascending-distance neighbours; top_k also breaks ties by lowest index, matching
torch.topk's behaviour on repeated values closely enough for parity tests).
A Pallas tiled variant that never materializes the full ``[B, S, N]`` distance
matrix lives in mpa_tpu.ops.pallas for large N.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mpa_tpu.ops.pairwise import square_distance


def knn(
    k: int, base: jnp.ndarray, query: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbours of each query point among the base points.

    Args:
      k: number of neighbours (static).
      base: ``[B, N, C]`` points/features searched over.
      query: ``[B, S, C]`` query points/features.

    Returns:
      ``(sqr_dists [B, S, k], idx [B, S, k])`` sorted by ascending distance.
    """
    d = square_distance(query, base)  # [B, S, N] fp32
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


def knn_self(k: int, points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN of a point set against itself (self match at distance 0 included,
    matching the reference's umbrella grouping which keeps then drops slot 0)."""
    return knn(k, points, points)
