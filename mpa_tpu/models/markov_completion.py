"""Shape-completion head on the Markov encoder.

The reference paper claims completion but ships no code (SURVEY.md §0);
designed here per the BASELINE config "decoder upsampling / feature-recovery
path stress": a coarse-to-fine decoder — the encoder's global feature seeds a
coarse point set (FC decoder), which a folding-style refinement expands by
``up_ratio`` with per-point local codes. Trained with symmetric Chamfer
distance (mpa_tpu.train.losses.chamfer_distance — MXU pairwise distances).

``include_input=True`` (default) appends the observed partial cloud to the
fine output — standard completion practice (the observed geometry is known
exactly, so the decoder only has to synthesize the missing region; PCN-family
models do the same union): it strictly reduces symmetric Chamfer and keeps
all shapes static.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.nn.keephigh import KeepHighResolutionEncoder
from mpa_tpu.nn.linear import LinearUnit
from mpa_tpu.models.registry import register_model


class MarkovCompletion(nn.Module):
    num_coarse: int = 256
    up_ratio: int = 4  # fine output = num_coarse * up_ratio points
    npoints: Sequence[int] = (512, 256, 128, 64, 32)
    channels: Sequence[int] = (64, 64, 64, 128, 256, 512)
    residuals: Sequence[bool] = (True, False, False, True, True, True)
    num_neighbors: int = 8
    encoder_features: int = 1024
    include_input: bool = True

    @nn.compact
    def __call__(
        self, points, *, train: bool = True, rng: Optional[jax.Array] = None
    ):
        """partial cloud ``[B, N, 3]`` -> (coarse ``[B, M, 3]``,
        fine ``[B, M*up_ratio (+ N if include_input), 3]``)."""
        B = points.shape[0]
        g = KeepHighResolutionEncoder(
            npoints=tuple(self.npoints),
            channels=tuple(self.channels),
            residuals=tuple(self.residuals),
            num_neighbors=self.num_neighbors,
            out_features=self.encoder_features,
            name="keep_high",
        )(points[..., :3], train=train, rng=rng)

        # Coarse FC decoder.
        h = LinearUnit(1024, norm="batch", name="dec1")(g, train=train)
        h = LinearUnit(1024, norm="batch", name="dec2")(h, train=train)
        coarse = nn.Dense(self.num_coarse * 3, name="dec3")(h).reshape(
            B, self.num_coarse, 3
        )

        # Folding refinement: per-coarse-point local grid codes + global feature.
        r = self.up_ratio
        grid = jnp.linspace(-0.05, 0.05, r)[None, None, :, None]  # [1,1,r,1]
        grid = jnp.broadcast_to(grid, (B, self.num_coarse, r, 1))
        centre = jnp.broadcast_to(
            coarse[:, :, None, :], (B, self.num_coarse, r, 3)
        )
        gfeat = jnp.broadcast_to(
            g[:, None, None, :], (B, self.num_coarse, r, g.shape[-1])
        )
        fold = jnp.concatenate([centre, grid, gfeat], axis=-1)
        fold = LinearUnit(256, norm="batch", name="fold1")(fold, train=train)
        fold = LinearUnit(128, norm="batch", name="fold2")(fold, train=train)
        delta = nn.Dense(3, name="fold3")(fold)
        fine = (centre + delta).reshape(B, self.num_coarse * r, 3)
        if self.include_input:
            fine = jnp.concatenate([points[..., :3], fine], axis=1)
        return coarse, fine


@register_model("markov_completion")
def _markov_completion(**kw) -> MarkovCompletion:
    return MarkovCompletion(**kw)
