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
    # Morton-window neighbour modes (opt-in approximation for large clouds;
    # same contract + measured quality methodology as MarkovSemSeg, which
    # these modes were built for). 'exact' (default) = reference semantics.
    neighbor_mode: str = "exact"
    fps_min_band: int = 512
    fps_min_samples: int = 64

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
        from mpa_tpu.nn.window_mode import morton_sort, morton_unsort

        points, label_onehot = inputs
        xyz = points[..., :3]
        inv_perm = None
        if self.neighbor_mode in ("window", "window_all"):
            xyz, inv_perm = morton_sort(xyz)
        _, final = KeepHighResolutionPartSeg(
            npoints=tuple(self.npoints),
            channels=tuple(self.channels),
            residuals=tuple(self.residuals),
            num_neighbors=self.num_neighbors,
            num_categories=self.num_categories,
            dtype=self.compute_dtype,
            neighbor_mode=self.neighbor_mode,
            fps_min_band=self.fps_min_band,
            fps_min_samples=self.fps_min_samples,
            name="keep_high",
        )(xyz, label_onehot, train=train, rng=rng)

        x = LinearUnit(512, norm="batch", dtype=self.compute_dtype, name="conv8")(final, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = LinearUnit(256, norm="batch", dtype=self.compute_dtype, name="conv9")(x, train=train)
        x = LinearUnit(128, norm="batch", dtype=self.compute_dtype, name="conv10")(x, train=train)
        x = nn.Dense(self.num_parts, name="conv11")(x.astype(jnp.float32))
        return morton_unsort(jax.nn.log_softmax(x, axis=-1), inv_perm)


@register_model("markov_partseg")
def _markov_partseg(**kw) -> MarkovPartSeg:
    return MarkovPartSeg(**kw)
