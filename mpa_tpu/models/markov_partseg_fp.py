"""Alternative part-segmentation model: feature-propagation decoder variant.

Reference semantics: the "part variant" ``KeepHighResolutionModulePartSeg``
(models/repsurf/repsurface_utils_part.py:4497-4758) — an alternative, simpler
architecture the reference kept alongside the published Fuse-decoder one:

- 6 down states N -> N/2 ... (la0..la5, channels 64,64,64,128,256,512) using
  the SINGLE-BRANCH LocalMerge (one feature LocalTrans over the spatial kNN);
- FPS runs in FEATURE space (farthest_point_sample on the feature tensors,
  :4641,4658,4677,4685,4693) — supported natively by ops.farthest_point_sample
  being dimension-agnostic;
- symmetric decoder: per-state self LocalMerge refinement (upla*), 3-NN IDW
  PointNetFeaturePropagation (no skip-concat), and ADDITIVE encoder skips;
- per-point output: concat(global max of conv6(points)[256], label conv7[64],
  points[64]) = 384 channels, then the standard head.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops import farthest_point_sample, index_points
from mpa_tpu.nn.linear import LinearUnit
from mpa_tpu.nn.local_merge import LocalMerge
from mpa_tpu.nn.feature_propagation import PointNetFeaturePropagation
from mpa_tpu.models.registry import register_model


class MarkovPartSegFP(nn.Module):
    num_parts: int = 50
    num_categories: int = 16
    npoints: Sequence[int] = (1024, 512, 256, 128, 64)
    channels: Sequence[int] = (64, 64, 64, 128, 256, 512)
    residuals: Sequence[bool] = (False, False, False, True, True, True)
    num_neighbors: int = 8
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        inputs: Tuple[jnp.ndarray, jnp.ndarray],
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        points, label_onehot = inputs
        xyz = points[..., :3]
        B, N, _ = xyz.shape
        ch = self.channels
        n_scales = len(self.npoints) + 1

        fps_keys = None
        if rng is not None and train:
            fps_keys = jax.random.split(rng, len(self.npoints))

        def merge(i, residual, single=True):
            return LocalMerge(
                ch[i], self.num_neighbors, residual=residual,
                single_branch=single, name=f"la{i}",
            )

        feats = [None] * n_scales
        positions = [xyz] + [None] * len(self.npoints)
        f, _, _ = merge(0, self.residuals[0])(xyz, xyz, train=train)
        feats[0] = f
        cur_xyz = xyz
        for i, npoint in enumerate(self.npoints):
            # FEATURE-space FPS (reference :4641 etc.).
            fps_idx = farthest_point_sample(
                feats[i], npoint, key=None if fps_keys is None else fps_keys[i]
            )
            new_xyz = index_points(cur_xyz, fps_idx)
            f, _, _ = merge(i + 1, self.residuals[i + 1])(
                new_xyz, cur_xyz, feature=feats[i], fps_idx=fps_idx, train=train
            )
            feats[i + 1] = f
            positions[i + 1] = new_xyz
            cur_xyz = new_xyz

        # Decoder: refine at scale s+1, IDW-propagate to scale s, add the skip.
        up = feats[-1]
        for s in range(n_scales - 2, -1, -1):
            up, _, _ = LocalMerge(
                ch[s + 1], self.num_neighbors, residual=False,
                single_branch=True, name=f"upla{s + 1}",
            )(positions[s + 1], positions[s + 1], feature=up, train=train)
            up = PointNetFeaturePropagation(
                ch[s], act=True, name=f"up{s + 2}_{s + 1}"
            )(positions[s], positions[s + 1], up, train=train)
            up = feats[s] + up

        g = LinearUnit(256, norm="batch", name="conv6")(up, train=train)
        g = jnp.max(g, axis=1, keepdims=True)  # [B, 1, 256]
        label = LinearUnit(64, norm="batch", name="conv7")(
            label_onehot[:, None, :], train=train
        )
        head = jnp.broadcast_to(
            jnp.concatenate([g, label], axis=-1), (B, N, 320)
        )
        final = jnp.concatenate([head, up], axis=-1)  # [B, N, 320 + ch0]

        x = LinearUnit(512, norm="batch", name="head1")(final, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = LinearUnit(256, norm="batch", name="head2")(x, train=train)
        x = LinearUnit(128, norm="batch", name="head3")(x, train=train)
        x = nn.Dense(self.num_parts, name="head4")(x)
        return jax.nn.log_softmax(x, axis=-1)


@register_model("markov_partseg_fp")
def _markov_partseg_fp(
    neighbor_mode="exact", fps_min_band=None, fps_min_samples=None, **kw
) -> MarkovPartSegFP:
    # The CLI passes the window-mode knobs to every partseg-task model
    # (cli/train.py); this FP-decoder variant implements only exact search.
    # Accept-and-check here so `--preset shapenetpart_fp` keeps working and
    # `--neighbor_mode window` fails with a clear error instead of a
    # dataclass TypeError. The fps floor knobs only affect banded (window
    # mode) FPS, so ignoring them in exact mode changes nothing.
    if neighbor_mode != "exact":
        raise ValueError(
            "markov_partseg_fp supports only neighbor_mode='exact'; use "
            "markov_partseg for the Morton-window modes"
        )
    return MarkovPartSegFP(**kw)
