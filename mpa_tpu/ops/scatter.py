"""Scatter-mean upsample — the Markov decoder's coarse→fine transition op.

Reference semantics: ``upsample`` (modules/pointnet2_utils.py:13-50, CUDA-only
via ``torch.cuda.FloatTensor().scatter_``): every coarse point s broadcasts its
feature to its K nearest fine points (``knn_idx[b, s, :]``); each fine point
averages the features of the coarse points that claimed it; unclaimed fine
points stay zero. The reference materializes a dense ``[B, S, N, C]`` scratch
tensor for this; we instead flatten to (batch, fine-point) segment keys and use
``segment_sum`` — O(B*S*K*C) memory, no dense intermediate (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_mean_upsample(
    features: jnp.ndarray,
    knn_idx: jnp.ndarray,
    num_fine: int,
    *,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Scatter coarse features to fine slots and count-normalize.

    Args:
      features: ``[B, S, C]`` coarse-point features.
      knn_idx: ``[B, S, K]`` indices of the K fine points claimed by each
        coarse point (values in ``[0, num_fine)``).
      num_fine: number of fine points N (static).

    Returns:
      ``[B, N, C]`` mean of claiming coarse features per fine point; zeros for
      unclaimed slots (count clamped to 1 before division — reference guard at
      modules/pointnet2_utils.py:44-48).
    """
    B, S, C = features.shape
    K = knn_idx.shape[-1]
    if use_pallas is None:
        # XLA scatters serialize on TPU; the one-hot-matmul kernel wins once
        # the problem is big enough to amortize its launch (measured ~2x at
        # part-seg scale). Small/CPU cases keep segment_sum.
        use_pallas = (
            jax.default_backend() == "tpu" and B * S * K >= 8192 and C >= 8
        )
    if use_pallas:
        from mpa_tpu.ops.pallas.scatter_pallas import scatter_mean_upsample_pallas

        return scatter_mean_upsample_pallas(features, knn_idx, num_fine).astype(
            features.dtype
        )
    batch_offset = jnp.arange(B, dtype=jnp.int32)[:, None, None] * num_fine
    seg = (knn_idx.astype(jnp.int32) + batch_offset).reshape(-1)  # [B*S*K]
    vals = jnp.broadcast_to(features[:, :, None, :], (B, S, K, C)).reshape(-1, C)
    summed = jax.ops.segment_sum(vals, seg, num_segments=B * num_fine)
    counts = jax.ops.segment_sum(
        jnp.ones((B * S * K,), dtype=features.dtype), seg, num_segments=B * num_fine
    )
    out = summed / jnp.maximum(counts, 1.0)[:, None]
    return out.reshape(B, num_fine, C)
