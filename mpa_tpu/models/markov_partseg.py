"""Markov part-segmentation model (ShapeNetPart: 16 categories / 50 parts).

Reference semantics: ``models/repsurf/pointnet2_part_seg_msg.py::get_model`` —
KeepHighResolutionPartSeg encoder-decoder producing 896-ch per-point features,
then a head Linear 896 -> 512 -> 256 -> 128 -> Dense(num_parts) with
Dropout(0.5) after the first layer. The reference returns raw logits and
applies log_softmax inside its loss; here the model returns log-probs directly
(argmax/category-masked argmax are unchanged; the smoothed loss consumes
log-probs).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.nn.keephigh_partseg import KeepHighResolutionPartSeg
from mpa_tpu.nn.linear import LinearUnit
from mpa_tpu.models.registry import register_model


class MarkovPartSeg(nn.Module):
    num_parts: int = 50
    num_categories: int = 16
    npoints: Sequence[int] = (1024, 512, 256, 128)
    channels: Sequence[int] = (64, 64, 64, 128, 256)
    residuals: Sequence[bool] = (True, False, False, True, True)
    num_neighbors: int = 8
    dropout: float = 0.5
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for mixed precision

    @nn.compact
    def __call__(
        self,
        inputs: Tuple[jnp.ndarray, jnp.ndarray],
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """inputs = (points ``[B, N, 3]``, label_onehot ``[B, num_categories]``)
        -> per-point log-probs ``[B, N, num_parts]``."""
        points, label_onehot = inputs
        xyz = points[..., :3]
        _, final = KeepHighResolutionPartSeg(
            npoints=tuple(self.npoints),
            channels=tuple(self.channels),
            residuals=tuple(self.residuals),
            num_neighbors=self.num_neighbors,
            num_categories=self.num_categories,
            dtype=self.compute_dtype,
            name="keep_high",
        )(xyz, label_onehot, train=train, rng=rng)

        x = LinearUnit(512, norm="batch", dtype=self.compute_dtype, name="conv8")(final, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = LinearUnit(256, norm="batch", dtype=self.compute_dtype, name="conv9")(x, train=train)
        x = LinearUnit(128, norm="batch", dtype=self.compute_dtype, name="conv10")(x, train=train)
        x = nn.Dense(self.num_parts, name="conv11")(x.astype(jnp.float32))
        return jax.nn.log_softmax(x, axis=-1)


@register_model("markov_partseg")
def _markov_partseg(**kw) -> MarkovPartSeg:
    return MarkovPartSeg(**kw)
