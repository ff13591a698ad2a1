"""Jit-able point-cloud augmentations.

Reference semantics: the numpy batch augmentations in ``tool/provider.py``
(normalize/shuffle/rotate-y/rotate-z/perturb/jitter/shift ±0.1/scale 0.8-1.25/
dropout) and the torch on-device pair in ``modules/ptaug_utils.py``
(``get_aug_args``: ScanObjectNN scale 0.5 / shift 0.3; ``transform_point_cloud``
gated by aug_scale/aug_shift flags). All keyed-PRNG jnp functions on
channel-last ``[B, N, C]`` batches so they run inside the jitted train step —
no host round-trip per batch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def normalize_point_cloud(points: jnp.ndarray) -> jnp.ndarray:
    """Centre + scale to the unit sphere per cloud (reference pc_normalize)."""
    centred = points - jnp.mean(points, axis=-2, keepdims=True)
    scale = jnp.max(
        jnp.sqrt(jnp.sum(centred**2, axis=-1, keepdims=True)), axis=-2, keepdims=True
    )
    return centred / jnp.maximum(scale, 1e-12)


def random_scale(
    key: jax.Array, points: jnp.ndarray, low: float = 0.8, high: float = 1.25
) -> jnp.ndarray:
    """Per-cloud isotropic scale (reference random_scale_point_cloud)."""
    B = points.shape[0]
    s = jax.random.uniform(key, (B, 1, 1), minval=low, maxval=high)
    return points * s


def random_shift(
    key: jax.Array, points: jnp.ndarray, shift_range: float = 0.1
) -> jnp.ndarray:
    """Per-cloud xyz translation (reference shift_point_cloud)."""
    B, _, C = points.shape
    t = jax.random.uniform(key, (B, 1, C), minval=-shift_range, maxval=shift_range)
    return points + t


def random_jitter(
    key: jax.Array, points: jnp.ndarray, sigma: float = 0.01, clip: float = 0.05
) -> jnp.ndarray:
    """Clipped gaussian per-point jitter (reference jitter_point_cloud)."""
    noise = jnp.clip(sigma * jax.random.normal(key, points.shape), -clip, clip)
    return points + noise


def _rotate(points: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("bnc,bcd->bnd", points, rot)


def random_rotate_y(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Random rotation about the up (y) axis (reference rotate_point_cloud)."""
    B = points.shape[0]
    a = jax.random.uniform(key, (B,), maxval=2.0 * jnp.pi)
    c, s = jnp.cos(a), jnp.sin(a)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(B, 3, 3)
    return _rotate(points, rot)


def random_rotate_z(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Random rotation about z (reference rotate_point_cloud_z)."""
    B = points.shape[0]
    a = jax.random.uniform(key, (B,), maxval=2.0 * jnp.pi)
    c, s = jnp.cos(a), jnp.sin(a)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
    ).reshape(B, 3, 3)
    return _rotate(points, rot)


def random_rotate_perturb(
    key: jax.Array,
    points: jnp.ndarray,
    angle_sigma: float = 0.06,
    angle_clip: float = 0.18,
) -> jnp.ndarray:
    """Small random rotations about all three axes
    (reference rotate_perturbation_point_cloud)."""
    B = points.shape[0]
    angles = jnp.clip(
        angle_sigma * jax.random.normal(key, (B, 3)), -angle_clip, angle_clip
    )
    cx, sx = jnp.cos(angles[:, 0]), jnp.sin(angles[:, 0])
    cy, sy = jnp.cos(angles[:, 1]), jnp.sin(angles[:, 1])
    cz, sz = jnp.cos(angles[:, 2]), jnp.sin(angles[:, 2])
    zeros, ones = jnp.zeros_like(cx), jnp.ones_like(cx)
    rx = jnp.stack([ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], -1).reshape(B, 3, 3)
    ry = jnp.stack([cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], -1).reshape(B, 3, 3)
    rz = jnp.stack([cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], -1).reshape(B, 3, 3)
    rot = jnp.einsum("bij,bjk,bkl->bil", rz, ry, rx)
    return _rotate(points, rot)


def _rotate_xyz_and_normal(points: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Apply per-cloud rotation to xyz (ch 0:3) and, when present, normals
    (ch 3:6); extra channels pass through untouched."""
    out = _rotate(points[..., :3], rot)
    if points.shape[-1] >= 6:
        out = jnp.concatenate([out, _rotate(points[..., 3:6], rot)], axis=-1)
    if points.shape[-1] > 6:
        out = jnp.concatenate([out, points[..., 6:]], axis=-1)
    return out


def _rot_y(c: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1).reshape(
        c.shape + (3, 3)
    )


def random_rotate_y_with_normal(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Per-cloud up-axis rotation applied to both xyz and normal channels of a
    ``[B, N, 6]`` batch (reference tool/provider.py:86-105
    rotate_point_cloud_with_normal)."""
    B = points.shape[0]
    a = jax.random.uniform(key, (B,), maxval=2.0 * jnp.pi)
    return _rotate_xyz_and_normal(points, _rot_y(jnp.cos(a), jnp.sin(a)))


def random_rotate_perturb_with_normal(
    key: jax.Array,
    points: jnp.ndarray,
    angle_sigma: float = 0.06,
    angle_clip: float = 0.18,
) -> jnp.ndarray:
    """Small 3-axis rotation perturbation of xyz + normal channels
    (reference tool/provider.py:107-132
    rotate_perturbation_point_cloud_with_normal)."""
    B = points.shape[0]
    angles = jnp.clip(
        angle_sigma * jax.random.normal(key, (B, 3)), -angle_clip, angle_clip
    )
    cx, sx = jnp.cos(angles[:, 0]), jnp.sin(angles[:, 0])
    cy, sy = jnp.cos(angles[:, 1]), jnp.sin(angles[:, 1])
    cz, sz = jnp.cos(angles[:, 2]), jnp.sin(angles[:, 2])
    zeros, ones = jnp.zeros_like(cx), jnp.ones_like(cx)
    rx = jnp.stack([ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], -1).reshape(B, 3, 3)
    ry = jnp.stack([cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], -1).reshape(B, 3, 3)
    rz = jnp.stack([cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], -1).reshape(B, 3, 3)
    rot = jnp.einsum("bij,bjk,bkl->bil", rz, ry, rx)
    return _rotate_xyz_and_normal(points, rot)


def rotate_by_angle(points: jnp.ndarray, angle) -> jnp.ndarray:
    """Deterministic up-axis rotation by a fixed angle (scalar or per-cloud
    ``[B]``); rotates xyz and, if present, normal channels (reference
    tool/provider.py:135-151 rotate_point_cloud_by_angle and :153-171
    rotate_point_cloud_by_angle_with_normal)."""
    B = points.shape[0]
    a = jnp.broadcast_to(jnp.asarray(angle, dtype=points.dtype), (B,))
    return _rotate_xyz_and_normal(points, _rot_y(jnp.cos(a), jnp.sin(a)))


def random_point_dropout(
    key: jax.Array, points: jnp.ndarray, max_dropout_ratio: float = 0.875
) -> jnp.ndarray:
    """Randomly replace a ratio of points with the first point of the cloud
    (reference random_point_dropout — keeps shapes static)."""
    B, N, _ = points.shape
    k_ratio, k_mask = jax.random.split(key)
    ratio = jax.random.uniform(k_ratio, (B, 1))
    drop = jax.random.uniform(k_mask, (B, N)) <= ratio * max_dropout_ratio
    first = points[:, :1, :]
    return jnp.where(drop[..., None], first, points)


def shuffle_points(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Independent per-cloud point permutation (reference shuffle_points)."""
    B, N, _ = points.shape
    keys = jax.random.split(key, B)
    perm = jax.vmap(lambda k: jax.random.permutation(k, N))(keys)
    return jnp.take_along_axis(points, perm[..., None], axis=1)


def get_aug_args(dataset: str) -> Dict[str, float]:
    """Per-dataset augmentation magnitudes (reference modules/ptaug_utils.py:13-24)."""
    if dataset.lower() in ("scanobjectnn", "scanobject"):
        return {"scale_factor": 0.5, "shift_factor": 0.3}
    return {"scale_factor": 0.25, "shift_factor": 0.2}


def transform_point_cloud(
    key: jax.Array,
    points: jnp.ndarray,
    *,
    aug_scale: bool = False,
    aug_shift: bool = False,
    scale_factor: float = 0.5,
    shift_factor: float = 0.3,
) -> jnp.ndarray:
    """The reference's flag-gated on-device train augment
    (modules/ptaug_utils.py:27-45; both flags default OFF in the trainers)."""
    k1, k2 = jax.random.split(key)
    if aug_scale:
        lo, hi = 1.0 - scale_factor, 1.0 + scale_factor
        points = points * jax.random.uniform(k1, (points.shape[0], 1, 1), minval=lo, maxval=hi)
    if aug_shift:
        points = random_shift(k2, points, shift_factor)
    return points
