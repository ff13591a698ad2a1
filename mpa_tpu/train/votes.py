"""Vote-based test-time augmentation.

Reference semantics: the training-time 3-vote eval
(tool/train_cls_scanobjectnn.py:78-124) and the standalone 10-vote / 50-repeat
eval (tool/test_classification.py:114-162): vote 0 is the clean cloud, every
later vote applies a per-cloud per-axis uniform scale; the vote pool is the
MEAN of the model's log-prob outputs; prediction is its argmax.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def scale_point_cloud(
    key: jax.Array, points: jnp.ndarray, low: float = 0.95, high: float = 1.05
) -> jnp.ndarray:
    """Per-cloud, per-axis uniform scaling of the xyz channels
    (reference ``PointcloudScale``, tool/test_classification.py:68-79)."""
    B = points.shape[0]
    scales = jax.random.uniform(key, (B, 1, 3), minval=low, maxval=high)
    return points.at[..., :3].set(points[..., :3] * scales)


def vote_predict(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    points: jnp.ndarray,
    key: jax.Array,
    num_votes: int = 3,
    scale_low: float = 0.95,
    scale_high: float = 1.05,
):
    """Run ``num_votes`` TTA passes; returns (vote_log_probs, single_log_probs)."""
    single = forward(points)
    pool = single
    for v in range(1, num_votes):
        scaled = scale_point_cloud(
            jax.random.fold_in(key, v), points, scale_low, scale_high
        )
        pool = pool + forward(scaled)
    return pool / num_votes, single
