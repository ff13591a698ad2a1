"""Pose-estimation head on the Markov classification encoder.

The reference paper claims pose estimation but ships no code (SURVEY.md §0);
designed here per the BASELINE config "rotation regression over the Markov
encoder": the KeepHighResolution global feature regresses a continuous 6D
rotation representation (Zhou et al., CVPR 2019 — the standard continuous
parameterization; direct quaternion/Euler regression has discontinuities) that
Gram-Schmidt orthonormalizes into a rotation matrix.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.nn.keephigh import KeepHighResolutionEncoder
from mpa_tpu.models.registry import register_model


def rotation_6d_to_matrix(x6: jnp.ndarray) -> jnp.ndarray:
    """``[..., 6]`` -> ``[..., 3, 3]`` via Gram-Schmidt of two 3-vectors."""
    a1, a2 = x6[..., :3], x6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def rotation_geodesic_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean geodesic angle between rotation matrices ``[..., 3, 3]``."""
    rel = jnp.einsum("...ij,...kj->...ik", pred, target)  # pred @ target^T
    trace = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.mean(jnp.arccos(cos))


class MarkovPose(nn.Module):
    npoints: Sequence[int] = (512, 256, 128, 64, 32)
    channels: Sequence[int] = (64, 64, 64, 128, 256, 512)
    residuals: Sequence[bool] = (True, False, False, True, True, True)
    num_neighbors: int = 8
    encoder_features: int = 1024
    # regression head: light dropout (heavy dropout on the global feature
    # raises the train/eval gap for continuous regression; measured on the
    # synthetic SO(3) task)
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, points, *, train: bool = True, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """points ``[B, N, 3]`` -> rotation matrices ``[B, 3, 3]``."""
        x = KeepHighResolutionEncoder(
            npoints=tuple(self.npoints),
            channels=tuple(self.channels),
            residuals=tuple(self.residuals),
            num_neighbors=self.num_neighbors,
            out_features=self.encoder_features,
            name="keep_high",
        )(points[..., :3], train=train, rng=rng)
        x = nn.Dense(512, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn1"
        )(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x6 = nn.Dense(6, name="fc_rot")(x)
        return rotation_6d_to_matrix(x6)


@register_model("markov_pose")
def _markov_pose(**kw) -> MarkovPose:
    return MarkovPose(**kw)
