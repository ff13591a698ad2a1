"""PointNet++ feature propagation: 3-NN inverse-distance interpolation + MLP.

Reference semantics: ``PointNetFeaturePropagation``
(modules/pointnet2_utils.py:860-912): interpolate coarse features onto fine
positions with 1/(d+1e-8) weights over the 3 nearest coarse points (S==1
broadcasts), then one LinearUnit (BatchNorm path, activation off by default —
``act=False``). The part-variant decoder (models/repsurf/
repsurface_utils_part.py:5185-5255) drops the skip-concat of fine features —
pass ``skip=None`` for that behaviour.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mpa_tpu.ops import three_nn_interpolate
from mpa_tpu.nn.linear import LinearUnit


class PointNetFeaturePropagation(nn.Module):
    out_channels: int
    act: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        xyz_fine,
        xyz_coarse,
        feat_coarse,
        skip: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
    ):
        """xyz_fine ``[B,N,3]``, xyz_coarse ``[B,S,3]``, feat_coarse ``[B,S,C]``,
        optional fine-scale skip features concatenated before the MLP."""
        S = xyz_coarse.shape[1]
        if S == 1:
            interp = jnp.broadcast_to(
                feat_coarse,
                (feat_coarse.shape[0], xyz_fine.shape[1], feat_coarse.shape[-1]),
            )
        else:
            interp = three_nn_interpolate(xyz_fine, xyz_coarse, feat_coarse)
        if skip is not None:
            interp = jnp.concatenate([skip, interp], axis=-1)
        return LinearUnit(self.out_channels, norm="batch", act=self.act, dtype=self.dtype, name="conv")(
            interp, train=train
        )
