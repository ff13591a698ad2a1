"""PointNet++-style set abstraction (RepSurf-SSG-2x baseline path).

Reference semantics: ``sample_and_group``/``sample_and_group_all``
(modules/repsurface_utils.py:12-84), ``SurfaceAbstraction``
(modules/repsurface_utils.py:206-254, dead in live models but kept for
capability parity) and ``SurfaceAbstractionCD`` (:256-319) whose first layer
runs separate convs over the position channels and feature channels and sums
them (centre/dual-input).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops import farthest_point_sample, index_points, ball_query
from mpa_tpu.geometry import xyz2sphere


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    center: jnp.ndarray,
    normal: jnp.ndarray,
    feature: Optional[jnp.ndarray],
    *,
    return_normal: bool = True,
    return_polar: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FPS -> gather centres/normals -> ball-query groups -> concat features.

    center ``[B,N,3]``, normal ``[B,N,Cn]``, feature ``[B,N,Cf]`` or None ->
    (new_center ``[B,S,3]``, new_normal ``[B,S,Cn]``, grouped ``[B,S,K,C]``).
    """
    fps_idx = farthest_point_sample(center, npoint)
    new_center = index_points(center, fps_idx)
    new_normal = index_points(normal, fps_idx)

    idx = ball_query(radius, nsample, center, new_center)
    group_normal = index_points(normal, idx)
    group_center = index_points(center, idx) - new_center[:, :, None, :]
    if return_polar:
        group_center = jnp.concatenate(
            [group_center, xyz2sphere(group_center)], axis=-1
        )
    if feature is not None:
        group_feature = index_points(feature, idx)
        parts = (
            [group_center, group_normal, group_feature]
            if return_normal
            else [group_center, group_feature]
        )
    else:
        parts = [group_center, group_normal]
    return new_center, new_normal, jnp.concatenate(parts, axis=-1)


def sample_and_group_all(
    center: jnp.ndarray,
    normal: jnp.ndarray,
    feature: Optional[jnp.ndarray],
    *,
    return_normal: bool = True,
    return_polar: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-group variant: the whole cloud becomes one group at the origin."""
    B, N, _ = center.shape
    new_center = jnp.zeros((B, 1, 3), center.dtype)
    new_normal = new_center
    group_center = center[:, None, :, :]
    if return_polar:
        group_center = jnp.concatenate(
            [group_center, xyz2sphere(group_center)], axis=-1
        )
    group_normal = normal[:, None, :, :]
    if return_normal:
        parts = [group_center, group_normal]
        if feature is not None:
            parts.append(feature[:, None, :, :])
    else:
        parts = [group_center]
        if feature is not None:
            parts.append(feature[:, None, :, :])
    return new_center, new_normal, jnp.concatenate(parts, axis=-1)


class _ConvBnStack(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        for i, c in enumerate(self.mlp):
            x = nn.Dense(c, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                use_fast_variance=False,
                name=f"bn{i}",
            )(x)
            x = jax.nn.relu(x)
        return x


class SurfaceAbstraction(nn.Module):
    """Plain PointNet++ SA: group -> shared conv/BN/ReLU stack -> max over K."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    return_polar: bool = True
    return_normal: bool = True

    @nn.compact
    def __call__(self, center, normal, feature, *, train: bool = True):
        if self.group_all:
            new_center, new_normal, grouped = sample_and_group_all(
                center, normal, feature,
                return_normal=self.return_normal, return_polar=self.return_polar,
            )
        else:
            new_center, new_normal, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, center, normal, feature,
                return_normal=self.return_normal, return_polar=self.return_polar,
            )
        x = _ConvBnStack(self.mlp, name="mlps")(grouped, train=train)
        return new_center, new_normal, jnp.max(x, axis=2)


class SurfaceAbstractionCD(nn.Module):
    """Centre/Dual-input SA: separate first-layer convs for position channels
    and feature channels, summed, then the shared conv stack + max-pool."""

    npoint: int
    radius: float
    nsample: int
    pos_channel: int
    mlp: Sequence[int]
    group_all: bool = False
    return_polar: bool = False
    return_normal: bool = True

    @nn.compact
    def __call__(self, center, normal, feature, *, train: bool = True):
        if self.group_all:
            new_center, new_normal, grouped = sample_and_group_all(
                center, normal, feature,
                return_normal=self.return_normal, return_polar=self.return_polar,
            )
        else:
            new_center, new_normal, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, center, normal, feature,
                return_normal=self.return_normal, return_polar=self.return_polar,
            )
        pos, feat = grouped[..., : self.pos_channel], grouped[..., self.pos_channel :]
        # use_fast_variance=False everywhere: ball-query backfill duplicates
        # points, so grouped activations can have |mean|^2 >> var, and the
        # one-pass E[x^2]-mean^2 variance then cancels catastrophically —
        # enough that sharded vs single-device reduction order visibly shifts
        # the normalized output. Two-pass variance is exact and matches torch.
        loc = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn_l0"
        )(nn.Dense(self.mlp[0], name="mlp_l0")(pos))
        ft = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn_f0"
        )(nn.Dense(self.mlp[0], name="mlp_f0")(feat))
        x = jax.nn.relu(loc + ft)
        x = _ConvBnStack(tuple(self.mlp[1:]), name="mlps")(x, train=train)
        return new_center, new_normal, jnp.max(x, axis=2)
