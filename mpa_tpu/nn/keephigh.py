"""KeepHighResolution encoder — the classification-side Markov state ladder.

Reference semantics: ``KeepHighResolutionModule``
(modules/repsurface_utils.py:542-639): six cascaded LocalMerge states at
N = full -> 512 -> 256 -> 128 -> 64 -> 32 (FPS between each; channels
64, 64, 64, 128, 256, 512), then Linear 512->512->1024, global max+avg pool
concat, and a final Dense 2048->1024 + BN + LeakyReLU. The reference also
constructs ``start``/``final``/``drop``/``normal_Trans`` submodules it never
calls — those are omitted.

The state ladder (npoints / channels / residual flags) is configurable so the
same module serves 1024-pt cls, scaled variants, and ablations.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops import farthest_point_sample, index_points
from mpa_tpu.nn.linear import LinearUnit
from mpa_tpu.nn.local_merge import LocalMerge


class KeepHighResolutionEncoder(nn.Module):
    # Per-state target sizes AFTER the first (full-resolution) state.
    npoints: Sequence[int] = (512, 256, 128, 64, 32)
    channels: Sequence[int] = (64, 64, 64, 128, 256, 512)  # len = len(npoints)+1
    residuals: Sequence[bool] = (True, False, False, True, True, True)
    num_neighbors: int = 8
    out_features: int = 1024
    fps_random_start: bool = False  # keyed FPS starts (reference torch.randint)
    dtype: Any = None  # bf16 mixed-precision compute when set

    @nn.compact
    def __call__(
        self, xyz, *, train: bool = True, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """xyz: ``[B, N, 3]`` -> global feature ``[B, out_features]``."""
        assert len(self.channels) == len(self.npoints) + 1
        feats, _, _ = LocalMerge(
            self.channels[0],
            self.num_neighbors,
            residual=self.residuals[0],
            dtype=self.dtype,
            name="la0",
        )(xyz, xyz, train=train)

        cur_xyz = xyz
        fps_keys = None
        if self.fps_random_start and train:
            base = rng if rng is not None else self.make_rng("augment")
            fps_keys = jax.random.split(base, len(self.npoints))

        for i, npoint in enumerate(self.npoints):
            fps_idx = farthest_point_sample(
                cur_xyz, npoint, key=None if fps_keys is None else fps_keys[i]
            )
            new_xyz = index_points(cur_xyz, fps_idx)
            feats, _, _ = LocalMerge(
                self.channels[i + 1],
                self.num_neighbors,
                residual=self.residuals[i + 1],
                dtype=self.dtype,
                name=f"la{i + 1}",
            )(new_xyz, cur_xyz, feature=feats, fps_idx=fps_idx, train=train)
            cur_xyz = new_xyz

        x = LinearUnit(self.channels[-1], norm="batch", dtype=self.dtype, name="conv3")(feats, train=train)
        x = LinearUnit(self.out_features, norm="batch", dtype=self.dtype, name="conv4")(x, train=train)

        gmax = jnp.max(x, axis=1)
        gavg = jnp.mean(x, axis=1)
        fused = jnp.concatenate([gmax, gavg], axis=-1)
        fused = nn.Dense(self.out_features, name="final_class")(fused)
        fused = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="final_bn"
        )(fused)
        return jax.nn.leaky_relu(fused, negative_slope=0.2)
