"""Markov semantic segmentation (S3DIS: 13 classes, 4096-pt blocks).

The reference paper claims semantic segmentation but ships no live code — only
a fully commented-out RandLA-style experiment
(models/repsurf/repsurface_utils_part.py:4761-5183). Per SURVEY.md §7, this
head is designed on the framework's own Markov encoder-decoder: the part-seg
KeepHighResolution ladder without the category-label branch, with per-point
input features (rgb + normalized room coordinates) injected alongside the
geometric first state.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops import index_points
from mpa_tpu.nn.window_mode import (
    WindowModeMixin,
    morton_sort,
    morton_unsort,
    scatter_mean_op,
    spec_or_none,
)
from mpa_tpu.nn.linear import LinearUnit
from mpa_tpu.nn.local_merge import LocalMerge
from mpa_tpu.nn.fuse import Fuse
from mpa_tpu.models.registry import register_model


class MarkovSemSeg(WindowModeMixin, nn.Module):
    """points ``[B, N, 3+F]`` (xyz + F extra channels) -> ``[B, N, C]`` log-probs."""

    num_classes: int = 13
    feature_channels: int = 6  # rgb + room-normalized xyz (S3DIS block format)
    npoints: Sequence[int] = (2048, 1024, 512, 256)  # scales below the 4096 input
    channels: Sequence[int] = (64, 64, 64, 128, 256)
    residuals: Sequence[bool] = (True, False, False, True, True)
    num_neighbors: int = 8
    dropout: float = 0.5
    # 'window': Morton-sort the block, restrict every SPATIAL LocalMerge
    # neighbour search to the index window (ops/pallas/window_attention.py),
    # un-permute the per-point outputs. An approximation (documented there)
    # that turns the O(N^2) spatial searches into O(N*window); the
    # feature-space kNN stays exact. 'window_all' additionally bands the
    # feature-space kNN — a stronger approximation (ADVICE.md r1; band
    # agreement and task quality measured in docs/PERF.md) that removes the
    # last O(N^2) terms: the full scalability mode for large scenes.
    # 'exact' (default) is the reference-style semantics.
    neighbor_mode: str = "exact"
    # Banded-FPS floors (window_all only): a scale bands its FPS when every
    # band keeps >= fps_min_band points and contributes >= fps_min_samples
    # samples (ops/fps.py pick_fps_bands). Lowered only in tests.
    fps_min_band: int = 512
    fps_min_samples: int = 64

    @nn.compact
    def __call__(
        self, points, *, train: bool = True, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        B, N, _ = points.shape
        inv_perm = None
        if self._windowed:
            points, inv_perm = morton_sort(points)
        xyz = points[..., :3]
        extra = points[..., 3 : 3 + self.feature_channels]
        ch = self.channels
        n_scales = len(self.npoints) + 1

        fps_keys = None
        if rng is not None and train:
            fps_keys = jax.random.split(rng, len(self.npoints))

        # First state: geometric LocalMerge fused with the input features.
        f0, idx0, d0 = LocalMerge(
            ch[0], self.num_neighbors, residual=self.residuals[0],
            include_xyz_branch=True, knn_mode=self._spatial_mode,
            feature_knn_mode=self._feature_mode, name="la0",
        )(xyz, xyz, train=train)
        if self.feature_channels:
            f0 = LinearUnit(ch[0], norm="batch", name="feat_in")(
                jnp.concatenate([f0, extra], axis=-1), train=train
            )

        feats = [f0] + [None] * len(self.npoints)
        positions = [xyz] + [None] * len(self.npoints)
        fps_list, knn_list = [], [idx0] + [None] * len(self.npoints)

        cur_xyz = xyz
        for i, npoint in enumerate(self.npoints):
            fps_idx = self._fps_scale(
                cur_xyz, npoint, None if fps_keys is None else fps_keys[i]
            )
            new_xyz = index_points(cur_xyz, fps_idx)
            f, idx_i, _ = LocalMerge(
                ch[i + 1], self.num_neighbors, residual=self.residuals[i + 1],
                include_xyz_branch=True, knn_mode=self._spatial_mode,
                feature_knn_mode=self._feature_mode, name=f"la{i + 1}",
            )(new_xyz, cur_xyz, feature=feats[i], fps_idx=fps_idx, train=train)
            feats[i + 1] = f
            positions[i + 1] = new_xyz
            fps_list.append(fps_idx)
            knn_list[i + 1] = idx_i
            cur_xyz = new_xyz

        # Decoder with per-scale Fuse (same shape as the part-seg decoder).
        fuse_ch = tuple(ch)
        top = LinearUnit(ch[-1], norm="batch", name="mlp")(feats[-1], train=train)
        top = Fuse(fuse_ch, self.num_neighbors, knn_mode=self._spatial_mode, name="fuse_top")(
            n_scales - 1, feats[:-1] + [top], fps_list, knn_list, positions,
            train=train,
        )[n_scales - 1]

        up_feats = [None] * n_scales
        up_feats[-1] = top
        for step, s in enumerate(range(n_scales - 2, -1, -1)):
            # Dense hoisted before the scatter (LinearUnit mid_op): matmul on
            # the coarse rows, scatter at the narrower target width. In window
            # mode the stored encoder idx is window-constrained whenever the
            # (S, N) pair admits a spec (LocalMerge's deterministic contract),
            # and the banded scatter kernel applies.
            wspec = (
                spec_or_none(positions[s + 1].shape[1], positions[s].shape[1])
                if self._windowed else None
            )
            mid = scatter_mean_op(knn_list[s + 1], positions[s].shape[1], wspec)
            up = LinearUnit(ch[s], norm="batch", name=f"up_conv{s + 1}")(
                up_feats[s + 1], train=train, mid_op=mid
            )
            f_s, _, _ = LocalMerge(
                ch[s], self.num_neighbors, residual=False,
                include_xyz_branch=True, knn_mode=self._spatial_mode,
                feature_knn_mode=self._feature_mode, name=f"la{s + 1}_up",
            )(
                positions[s], positions[s], feature=up, train=train,
                # scale 0's self-kNN was already computed by la0 on the same
                # positions — exact reuse, saves the largest decoder search.
                spatial_knn=(d0, idx0) if s == 0 else None,
            )
            src = list(feats)
            src[s] = f_s
            up_feats[s] = Fuse(fuse_ch, self.num_neighbors, knn_mode=self._spatial_mode, name=f"fuse{step + 1}")(
                s, src, fps_list, knn_list, positions, train=train
            )[s]

        global_rep = jnp.concatenate(
            [jnp.max(up_feats[s], axis=1) for s in range(n_scales)], axis=-1
        )
        global_rep = jnp.broadcast_to(
            global_rep[:, None, :], (B, N, global_rep.shape[-1])
        )
        per_point = LinearUnit(256, norm="batch", name="conv5")(
            up_feats[0], train=train
        )
        x = jnp.concatenate([per_point, global_rep], axis=-1)

        x = LinearUnit(512, norm="batch", name="head1")(x, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = LinearUnit(256, norm="batch", name="head2")(x, train=train)
        x = nn.Dense(self.num_classes, name="head3")(x)
        return morton_unsort(jax.nn.log_softmax(x, axis=-1), inv_perm)


@register_model("markov_semseg")
def _markov_semseg(**kw) -> MarkovSemSeg:
    return MarkovSemSeg(**kw)
