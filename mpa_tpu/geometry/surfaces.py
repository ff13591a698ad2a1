"""Triangle surface features: normals, centroids, plane offsets, NaN repair.

Reference semantics: modules/recons_utils.py — ``cal_normal`` (:27-57),
``cal_center`` (:82-90), ``cal_const`` (:108-124), ``cal_area`` (:93-105),
``check_nan_umb`` (:152-176), ``pca`` (:60-79). All re-expressed as pure,
static-shape jnp with keyed randomness and ``where``-based masking.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cal_normal(
    group_xyz: jnp.ndarray,
    *,
    random_inv_key: Optional[jax.Array] = None,
    is_group: bool = False,
) -> jnp.ndarray:
    """Unit triangle normal with deterministic sign fix (+ optional per-batch
    random inversion, train-time stochasticity).

    Args:
      group_xyz: ``[B, N, 3pts, 3]`` or ``[B, N, G, 3pts, 3]`` triangles
        (first three points along the points axis define the triangle).
      random_inv_key: optional PRNG key — when given, each batch element's
        normals are flipped with probability 1/2 (reference ``random_inv``).
      is_group: group mode — the sign fix uses the *first* triangle's
        x-component per (B, N) and applies it to all G (reference
        modules/recons_utils.py:44-46).

    Returns:
      unit normals ``[B, N, 3]`` / ``[B, N, G, 3]`` (NaN where the triangle is
      degenerate — repaired downstream by :func:`check_nan_umbrella`).
    """
    e1 = group_xyz[..., 1, :] - group_xyz[..., 0, :]
    e2 = group_xyz[..., 2, :] - group_xyz[..., 0, :]
    nor = jnp.cross(e1, e2)
    # Degenerate triangles (duplicate points): the reference emits NaN here
    # and repairs it in check_nan_umb. A NaN VALUE poisons VJPs of anything
    # that multiplies by it (NaN * 0-cotangent = NaN), so instead emit a ZERO
    # normal — impossible for a valid unit normal — which the repair detects
    # exactly like NaN; post-repair forward is identical to the reference.
    n2 = jnp.sum(nor * nor, axis=-1, keepdims=True)
    degen = n2 == 0.0
    unit = jnp.where(degen, 0.0, nor / jnp.sqrt(jnp.where(degen, 1.0, n2)))
    if not is_group:
        pos_mask = jnp.where(unit[..., 0] > 0, 1.0, -1.0)
    else:
        # Sign decided by the first triangle in the fan, applied to all G.
        pos_mask = jnp.where(unit[..., 0:1, 0] > 0, 1.0, -1.0)
    unit = unit * pos_mask[..., None]
    if random_inv_key is not None:
        B = group_xyz.shape[0]
        flips = jax.random.randint(random_inv_key, (B,), 0, 2).astype(unit.dtype)
        flips = flips * 2.0 - 1.0
        extra = unit.ndim - 1
        unit = unit * flips.reshape((B,) + (1,) * extra)
    return unit


def cal_center(group_xyz: jnp.ndarray) -> jnp.ndarray:
    """Triangle centroid: mean over the points axis ``[..., K, 3] -> [..., 3]``."""
    return jnp.mean(group_xyz, axis=-2)


def cal_const(
    normal: jnp.ndarray, center: jnp.ndarray, is_normalize: bool = True
) -> jnp.ndarray:
    """Plane offset ("signed distance") ``<n, c>`` / sqrt(3) -> ``[..., 1]``."""
    const = jnp.sum(normal * center, axis=-1, keepdims=True)
    return const / jnp.sqrt(3.0) if is_normalize else const


def cal_area(group_xyz: jnp.ndarray) -> jnp.ndarray:
    """Triangle area via the three projected-plane determinants
    ``[..., 3pts, 3] -> [..., 1]`` (reference modules/recons_utils.py:93-105;
    dead in the reference's live paths, kept for capability parity)."""
    x = group_xyz[..., 0]
    y = group_xyz[..., 1]
    z = group_xyz[..., 2]

    def det3(u, v):
        # | u0 v0 1 ; u1 v1 1 ; u2 v2 1 |
        return (
            u[..., 0] * (v[..., 1] - v[..., 2])
            - v[..., 0] * (u[..., 1] - u[..., 2])
            + (u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1])
        )

    area = jnp.sqrt(det3(x, y) ** 2 + det3(y, z) ** 2 + det3(z, x) ** 2)
    return area[..., None]


def check_nan(
    normal: jnp.ndarray,
    center: jnp.ndarray,
    pos: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Non-umbrella NaN repair (reference ``check_nan``,
    modules/recons_utils.py:127-149): per BATCH row, points whose normal has
    any NaN (or all-zero, see cal_normal) are replaced by the first valid
    point's values."""
    bad = jnp.any(jnp.isnan(normal), axis=-1) | jnp.all(normal == 0.0, axis=-1)
    first_ok = jnp.argmax((~bad).astype(jnp.int32), axis=-1)  # [B]

    def take_first(x):
        picked = jnp.take_along_axis(x, first_ok[:, None, None], axis=1)
        return jnp.where(bad[..., None], picked, x)

    if pos is not None:
        return take_first(normal), take_first(center), take_first(pos)
    return take_first(normal), take_first(center)


def knn_surface_features(
    center: jnp.ndarray,
    context: jnp.ndarray,
    k: int = 3,
    *,
    return_dist: bool = False,
    random_inv_key: Optional[jax.Array] = None,
):
    """Plain-kNN triangle surface constructor (reference ``SurfaceConstructor``
    + ``knn_recons``, modules/recons_utils.py:179-228; only exercised by the
    reference's __main__ smoke test): the k=3 nearest context points around
    each centre form a triangle whose unit normal / centroid / plane offset
    become the surface features.

    Returns (normal ``[B,N,3]``, centroid ``[B,N,3]``[, pos ``[B,N,1]``]).
    """
    from mpa_tpu.ops.knn import knn
    from mpa_tpu.ops.gather import index_points

    _, idx = knn(k, context, center)
    group_xyz = index_points(context, idx)  # [B, N, K, 3]
    normal = cal_normal(group_xyz, random_inv_key=random_inv_key)
    centroid = cal_center(group_xyz)
    if return_dist:
        pos = cal_const(normal, centroid)
        return check_nan(normal, centroid, pos)
    return check_nan(normal, centroid)


def check_nan_umbrella(
    normal: jnp.ndarray,
    center: jnp.ndarray,
    pos: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Repair degenerate-triangle NaN normals per umbrella fan.

    For each (B, N): rows along G whose normal is invalid — any NaN (the
    reference's marker) or all-zero (this framework's gradient-safe
    degenerate marker, see cal_normal) — are replaced (in normal, center, and
    optionally pos) by the first valid row of that fan (reference
    ``check_nan_umb``). Implemented with masked ``where`` — no boolean
    indexing, fully jittable.
    """
    bad = jnp.any(jnp.isnan(normal), axis=-1) | jnp.all(normal == 0.0, axis=-1)
    first_ok = jnp.argmax((~bad).astype(jnp.int32), axis=-1)  # [B, N]

    def take_first(x):
        picked = jnp.take_along_axis(x, first_ok[..., None, None], axis=2)
        return jnp.where(bad[..., None], picked, x)

    if pos is not None:
        return take_first(normal), take_first(center), take_first(pos)
    return take_first(normal), take_first(center)


def pca(x: jnp.ndarray, k: int, center: bool = True):
    """SVD-based PCA of ``[n, d]`` → dict with top-k components and explained
    variance (reference modules/recons_utils.py:60-79; dead in live paths,
    kept for capability parity)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True) if center else x
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    return {
        "X": x,
        "k": k,
        "components": vt[:k].T,
        "explained_variance": (s[:k] ** 2) / (n - 1),
    }
