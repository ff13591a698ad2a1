"""3-NN inverse-distance-weighted feature interpolation (coarse → fine).

Reference semantics: ``PointNetFeaturePropagation.forward`` distance-weighting
(modules/pointnet2_utils.py:860-912): for each fine point, find its 3 nearest
coarse points, weight their features by 1/(d + 1e-8) normalized over the 3.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpa_tpu.ops.knn import knn
from mpa_tpu.ops.gather import index_points


def three_nn_interpolate(
    xyz_fine: jnp.ndarray, xyz_coarse: jnp.ndarray, features: jnp.ndarray
) -> jnp.ndarray:
    """Interpolate coarse features onto fine positions.

    Args:
      xyz_fine: ``[B, N, 3]`` target positions.
      xyz_coarse: ``[B, S, 3]`` source positions (S >= 3).
      features: ``[B, S, C]`` source features.

    Returns:
      ``[B, N, C]`` IDW-interpolated features.
    """
    d, idx = knn(3, xyz_coarse, xyz_fine)  # [B, N, 3]
    w = 1.0 / (d + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighb = index_points(features, idx)  # [B, N, 3, C]
    return jnp.sum(neighb * w[..., None].astype(features.dtype), axis=2)
