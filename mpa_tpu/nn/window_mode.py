"""Shared wiring for the Morton-window neighbour modes.

The window modes (opt-in approximation for large scenes; semantics and
measured quality in ops/pallas/window_attention.py and docs/PERF.md) are
exposed by several models (markov_semseg, markov_partseg/KeepHighResolution
PartSeg) and by Fuse. The mode plumbing — mode-string predicates, the
banded-FPS encoder step, the spec-or-fallback decoder scatter, and the
Morton sort/unsort input wrapper — is identical everywhere; this module is
its single definition so a fix to spec admission or the scatter fallback
cannot silently diverge between models (r4 self-review).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mpa_tpu.ops import (
    banded_farthest_point_sample,
    pick_fps_bands,
    scatter_mean_upsample,
)


def spec_or_none(S: int, N: int):
    """Banding spec for an (S, N) coarse/fine scale pair, or None when the
    pair doesn't admit one. Deterministic in the shapes — so it also tells
    whether a STORED encoder kNN index was window-constrained (LocalMerge
    applies the same admission when it built that index)."""
    from mpa_tpu.ops.pallas.window_attention import make_window_spec

    try:
        return make_window_spec(S, N)
    except ValueError:
        return None


def scatter_mean_op(knn_idx: jnp.ndarray, num_fine: int, wspec):
    """The decoder upsample as a LinearUnit ``mid_op``: banded
    ``windowed_scatter_mean`` when ``wspec`` is given, exact
    ``scatter_mean_upsample`` otherwise. Late-bound defaults pin the loop
    variables (these are built inside per-scale loops)."""
    if wspec is not None:
        from mpa_tpu.ops.pallas.window_attention import windowed_scatter_mean

        return lambda y, i=knn_idx, n=num_fine, w=wspec: (
            windowed_scatter_mean(y, i, n, w)
        )
    return lambda y, i=knn_idx, n=num_fine: scatter_mean_upsample(y, i, n)


def morton_sort(points: jnp.ndarray):
    """Sort ``[B, N, 3+F]`` points along the Morton curve of their xyz.
    Returns (sorted points, inverse permutation) — apply
    :func:`morton_unsort` to per-point outputs to restore input order."""
    from mpa_tpu.ops.morton import morton_order

    perm = morton_order(points[..., :3])
    inv_perm = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(points, perm[..., None], axis=1), inv_perm


def morton_unsort(out: jnp.ndarray, inv_perm: Optional[jnp.ndarray]):
    """Restore per-point outputs ``[B, N, C]`` to pre-:func:`morton_sort`
    order; identity when ``inv_perm`` is None (exact mode)."""
    if inv_perm is None:
        return out
    return jnp.take_along_axis(out, inv_perm[..., None], axis=1)


class WindowModeMixin:
    """Mode predicates + the banded-FPS encoder step for models that declare
    ``neighbor_mode`` / ``fps_min_band`` / ``fps_min_samples`` fields.

    'window': Morton-sorted input, banded SPATIAL searches + attention +
    decoder scatter; feature-space kNN stays exact. 'window_all':
    additionally bands the feature kNN and FPS — the full scalability mode.
    'exact' (default everywhere): reference-style semantics.
    """

    @property
    def _windowed(self) -> bool:
        return self.neighbor_mode in ("window", "window_all")

    @property
    def _feature_mode(self) -> str:
        return "window" if self.neighbor_mode == "window_all" else "exact"

    @property
    def _spatial_mode(self) -> str:
        return "window" if self._windowed else "exact"

    def _fps_scale(
        self, cur_xyz: jnp.ndarray, npoint: int, key: Optional[jax.Array]
    ) -> jnp.ndarray:
        """One encoder-ladder FPS step. In 'window_all' the (Morton-sorted)
        cloud is split into contiguous index bands — spatially coherent, so
        per-band FPS keeps uniform coverage while cutting the serial chain by
        the band count (floors: ops/fps.py pick_fps_bands). When windowed,
        the subset is re-sorted so every scale stays Morton-ordered (the
        banding precondition); an FPS SET is order-invariant."""
        fps_bands = (
            pick_fps_bands(
                cur_xyz.shape[1], npoint,
                min_band=self.fps_min_band,
                min_samples=self.fps_min_samples,
            )
            if self.neighbor_mode == "window_all"
            else 1
        )
        fps_idx = banded_farthest_point_sample(cur_xyz, npoint, fps_bands, key=key)
        if self._windowed:
            fps_idx = jnp.sort(fps_idx, axis=-1)
        return fps_idx
