"""Fuse — cross-state (all-pairs) feature exchange between Markov scales.

Reference semantics: ``Fuse`` (modules/pointnet2_utils.py:576-709). For a
target scale t among 5 states (N = 2048/1024/512/256/128, channels c0..c4),
bring every other scale's features to it:

- finer s < t: gather by the COMPOSED FPS index chain
  ``idx = FPS_t; for j in t-1..s+1: idx = FPS_j[idx]``
  (each FPS_j maps scale-j indices into scale j-1) — e.g. the reference's
  ``idx04 = FPS_0[FPS_1[FPS_2[FPS_3]]]`` at :617-619;
- coarser s > t: scatter-mean ``upsample``; adjacent scales reuse the
  encoder's stored kNN index, non-adjacent ones compute a fresh
  ``knn(8, xyz_t, xyz_s)`` with scale_ratio 2^(s-t) (:650,668,682-705);
- each pair goes through its own LinearUnit ``conv{s}{t}``, the sum (plus the
  target itself) through ``conv{t}``, with a residual add of the target.

TPU design: the index chains are static-shape int gathers that XLA fuses; the
scatter is the segment-sum upsample (no dense [B,S,N,C] scratch).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mpa_tpu.ops import index_points, knn
from mpa_tpu.nn.linear import LinearUnit


def compose_fps_chain(fps: Sequence[jnp.ndarray], src: int, dst: int) -> jnp.ndarray:
    """Indices of scale-``dst`` points inside scale ``src`` (src < dst).

    fps[j] maps scale-(j+1) indices into scale j (i.e. fps[0] = FPS from scale
    0 to scale 1, ``[B, N1]``).
    """
    assert src < dst
    idx = fps[dst - 1]  # [B, N_dst] into scale dst-1
    for j in range(dst - 2, src - 1, -1):
        idx = jnp.take_along_axis(fps[j], idx, axis=1, mode="promise_in_bounds")
    return idx


class Fuse(nn.Module):
    """One fuse step toward ``target``: features[target] is refreshed from all
    five scales; the other features pass through untouched (reference returns
    the full 5-tuple with only the target slot updated)."""

    channels: Sequence[int]  # (c0..c4)
    num_neighbors: int = 8
    dtype: Any = None
    # 'window': Morton-banded cross-scale kNN + banded scatter-mean for the
    # coarser->finer moves (ops/pallas/window_attention.py) — only valid when
    # every scale is Morton-ordered (the window-mode models' invariant).
    # Scale pairs that don't satisfy the banding contract fall back to exact.
    knn_mode: str = "exact"

    def _wspec(self, S: int, N: int):
        """The banding spec Fuse/LocalMerge searches use for an (S, N) scale
        pair in window mode, or None (shared admission: window_mode.spec_or_
        none, so Fuse can never diverge from the models' decoder wiring)."""
        if self.knn_mode != "window":
            return None
        from mpa_tpu.nn.window_mode import spec_or_none

        return spec_or_none(S, N)

    @nn.compact
    def __call__(
        self,
        target: int,
        features: List[jnp.ndarray],  # f0..f4, channel c_s at scale s
        fps: Sequence[jnp.ndarray],  # fps[j]: [B, N_{j+1}] into scale j
        knn_idx: Sequence[Optional[jnp.ndarray]],  # stored encoder kNN per scale
        xyz: Sequence[Optional[jnp.ndarray]],  # positions per scale
        *,
        train: bool = True,
    ) -> List[jnp.ndarray]:
        t = target
        ft = features[t]
        total = ft
        for s in range(len(features)):
            if s == t:
                continue
            unit = LinearUnit(
                self.channels[t], norm="batch", dtype=self.dtype, name=f"conv{s}{t}"
            )
            if s < t:  # finer -> gather down the FPS chain
                idx = compose_fps_chain(fps, s, t)
                moved = unit(index_points(features[s], idx), train=train)
            else:  # coarser -> scatter-mean up
                num_fine = features[t].shape[1]
                wspec = self._wspec(features[s].shape[1], num_fine)
                if s == t + 1 and knn_idx[s] is not None:
                    up_idx = knn_idx[s]  # windowed iff wspec is not None
                elif wspec is not None:
                    from mpa_tpu.ops.pallas.window_attention import (
                        windowed_knn_with_spec,
                    )

                    _, up_idx, wspec = windowed_knn_with_spec(
                        self.num_neighbors, xyz[t], xyz[s]
                    )
                else:
                    _, up_idx = knn(self.num_neighbors, xyz[t], xyz[s])
                from mpa_tpu.nn.window_mode import scatter_mean_op

                scatter = scatter_mean_op(up_idx, num_fine, wspec)
                # Hoist the Dense before the scatter (LinearUnit mid_op):
                # the matmul runs on the coarse rows (2-16x fewer) and the
                # scatter mixes rows at the target width c_t instead of c_s.
                moved = unit(features[s], train=train, mid_op=scatter)
            total = total + moved
        out = (
            LinearUnit(self.channels[t], norm="batch", dtype=self.dtype, name=f"conv{t}")(
                total, train=train
            )
            + ft
        )
        result = list(features)
        result[t] = out
        return result
