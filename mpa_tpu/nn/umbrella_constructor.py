"""Umbrella RepSurf surface feature constructor.

Reference semantics: ``UmbrellaSurfaceConstructor``
(modules/repsurface_utils.py:321-376): umbrella triangle fans around every
point -> per-triangle (centroid[3], polar[3], normal[3], const[1]) = 10
channels -> shared 3-layer 1x1 conv MLP (first conv bias-free) with BN+ReLU ->
sum/max/avg aggregation over the K-1 triangles.

TPU design: the 1x1 convs are Denses over the channel-last ``[B, N, G, C]``
tensor — XLA fuses the whole feature stack into the surrounding graph; BN
statistics reduce over (B, N, G) exactly like the reference's BatchNorm2d on
``[B, C, G, N]``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.geometry import (
    group_by_umbrella,
    cal_normal,
    cal_center,
    cal_const,
    check_nan_umbrella,
    xyz2sphere,
)


class UmbrellaSurfaceConstructor(nn.Module):
    k: int = 9
    channels: int = 10
    aggr_type: str = "sum"  # 'sum' | 'max' | 'avg'
    return_dist: bool = True  # include the plane-offset channel
    random_inv: bool = True  # train-time stochastic normal inversion

    @nn.compact
    def __call__(self, center, *, train: bool = True, rng: Optional[jax.Array] = None):
        """center: ``[B, N, 3]`` -> ``[B, N, channels]`` RepSurf features."""
        group_xyz = group_by_umbrella(center, center, k=self.k)  # [B,N,G,3,3]

        inv_key = None
        if self.random_inv and train:
            inv_key = rng if rng is not None else self.make_rng("augment")
        group_normal = cal_normal(group_xyz, random_inv_key=inv_key, is_group=True)
        group_center = cal_center(group_xyz)
        group_polar = xyz2sphere(group_center)
        if self.return_dist:
            group_pos = cal_const(group_normal, group_center)
            group_normal, group_center, group_pos = check_nan_umbrella(
                group_normal, group_center, group_pos
            )
            feat = jnp.concatenate(
                [group_center, group_polar, group_normal, group_pos], axis=-1
            )
        else:
            group_normal, group_center = check_nan_umbrella(group_normal, group_center)
            feat = jnp.concatenate([group_center, group_polar, group_normal], axis=-1)

        # Shared per-triangle MLP (reference: Conv2d/BN/ReLU x3, first bias-free).
        feat = nn.Dense(self.channels, use_bias=False, name="mlp0")(feat)
        feat = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn0"
        )(feat)
        feat = jax.nn.relu(feat)
        feat = nn.Dense(self.channels, name="mlp1")(feat)
        feat = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn1"
        )(feat)
        feat = jax.nn.relu(feat)
        feat = nn.Dense(self.channels, name="mlp2")(feat)

        if self.aggr_type == "max":
            return jnp.max(feat, axis=2)
        if self.aggr_type == "avg":
            return jnp.mean(feat, axis=2)
        return jnp.sum(feat, axis=2)
