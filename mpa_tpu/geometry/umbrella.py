"""Umbrella surface grouping: triangle fans around each point.

Reference semantics: ``group_by_umbrella``
(modules/repsurface_utils.py:106-126): take the k nearest neighbours of each
point (k=9 in live configs), drop the self-match, express neighbours relative
to the centre, sort them by azimuth phi, and pair each with its rolled
successor plus the centre (origin) to form K-1 triangles.

TPU design: azimuth sort via ``jnp.argsort`` + ``take_along_axis`` (static
shapes); the whole thing is one fused XLA graph downstream of the kNN einsum.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpa_tpu.ops.knn import knn
from mpa_tpu.ops.gather import index_points, resort_points
from mpa_tpu.geometry.spherical import xyz2sphere


def group_by_umbrella(xyz: jnp.ndarray, new_xyz: jnp.ndarray, k: int = 9) -> jnp.ndarray:
    """Build umbrella triangle fans.

    Args:
      xyz: ``[B, N, 3]`` base points.
      new_xyz: ``[B, N', 3]`` centres (the live reference always passes the
        same set for both).
      k: kNN size; produces k-1 triangles per centre.

    Returns:
      ``[B, N', K-1, 3pts, 3]`` centre-relative triangles: point 0 is the
      origin (the centre itself), points 1-2 are an azimuth-adjacent
      neighbour pair.
    """
    _, idx = knn(k, xyz, new_xyz)
    group_xyz = index_points(xyz, idx)[:, :, 1:]  # drop self-match: [B,N',K-1,3]
    group_rel = group_xyz - new_xyz[:, :, None, :]
    phi = xyz2sphere(group_rel)[..., 2]  # [B, N', K-1]
    sort_idx = jnp.argsort(phi, axis=-1)
    sorted_rel = resort_points(group_rel, sort_idx)[..., None, :]  # [B,N',K-1,1,3]
    rolled = jnp.roll(sorted_rel, -1, axis=-3)
    centre = jnp.zeros_like(sorted_rel)
    return jnp.concatenate([centre, sorted_rel, rolled], axis=-2)
