"""Farthest point sampling.

Reference semantics: ``farthest_point_sample`` (modules/pointnet2_utils.py:84-109)
— iterative: keep a running min-distance to the selected set, pick the argmax
each step. The reference starts from ``torch.randint``; we default to a
deterministic start (index 0) for reproducibility and accept a PRNG key for the
stochastic behaviour. The part-seg variant of the reference runs FPS on feature
tensors, not xyz (models/repsurf/repsurface_utils_part.py:4641) — this op is
dimension-agnostic (any C) so both work.

TPU design: the selection chain is inherently sequential (npoint steps), so we
run a ``lax.fori_loop`` whose per-step work — one ``[B, N, C]`` distance update
and one argmax — is fully batch-parallel on the VPU. All shapes static.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def farthest_point_sample(
    points: jnp.ndarray,
    npoint: int,
    *,
    key: Optional[jax.Array] = None,
    start_idx: int = 0,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Args:
      points: ``[B, N, C]`` point coordinates (or features — FPS in feature
        space is a first-class mode, see module docstring).
      npoint: number of samples (static, <= N).
      key: optional PRNG key; when given, the start index is uniform random
        per batch element (reference behaviour, modules/pointnet2_utils.py:96).
      start_idx: deterministic start index used when ``key`` is None.
      use_pallas: force/forbid the Pallas kernel; None = auto (TPU + small C —
        ~5x faster than the XLA while-loop at 2048->1024 on v5e).

    Returns:
      ``[B, npoint]`` int32 indices into N.
    """
    B, N, C = points.shape
    # Indices are integer outputs: no gradient ever flows through FPS. Stop
    # gradients at entry so differentiating a model that runs FPS on
    # param-dependent tensors (feature-space FPS, markov_partseg_fp) does not
    # ask the Pallas kernel for a JVP rule it cannot have.
    points = jax.lax.stop_gradient(points)
    if use_pallas is None:
        # N < 256 (one-two lane tiles) trips a Mosaic argmax legalization bug,
        # and the XLA loop is cheap at that size anyway.
        use_pallas = jax.default_backend() == "tpu" and C <= 16 and N >= 256
    if use_pallas:
        from mpa_tpu.ops.pallas.fps_pallas import farthest_point_sample_pallas

        return farthest_point_sample_pallas(
            points, npoint, key=key, start_idx=start_idx
        )
    pts = points.astype(jnp.float32)

    if key is not None:
        first = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        first = jnp.full((B,), start_idx, dtype=jnp.int32)

    def body(i, carry):
        min_d, last, out = carry
        # Distance from the last-selected point to all points: [B, N].
        last_pt = jnp.take_along_axis(pts, last[:, None, None], axis=1)  # [B,1,C]
        d = jnp.sum((pts - last_pt) ** 2, axis=-1)  # [B, N]
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)  # [B]
        out = out.at[:, i].set(last)
        return min_d, nxt, out

    init = (
        jnp.full((B, N), jnp.inf, dtype=jnp.float32),
        first,
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, out = jax.lax.fori_loop(0, npoint, body, init)
    return out


def pick_fps_bands(
    N: int, npoint: int, *, min_band: int = 512, min_samples: int = 64
) -> int:
    """Largest power-of-two band count G such that each band keeps at least
    ``min_band`` points and contributes at least ``min_samples`` samples.
    Returns 1 (= exact FPS) when no banding fits."""
    g = 1
    while (
        N % (g * 2) == 0
        and npoint % (g * 2) == 0
        and N // (g * 2) >= min_band
        and npoint // (g * 2) >= min_samples
    ):
        g *= 2
    return g


def banded_farthest_point_sample(
    points: jnp.ndarray,
    npoint: int,
    n_bands: int,
    *,
    key: Optional[jax.Array] = None,
    start_idx: int = 0,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Banded FPS for Morton-sorted clouds (the window-mode approximation).

    Splits the N axis into ``n_bands`` contiguous index bands — spatially
    coherent buckets when the cloud is Morton-ordered (the window-mode
    precondition, ops/pallas/window_attention.py) — and runs exact FPS inside
    each band for ``npoint / n_bands`` samples. The selection chain, the only
    sequential part of FPS, shrinks from ``npoint`` steps over N points to
    ``npoint / n_bands`` steps over ``N / n_bands`` points; the per-band work
    is batch-parallel (folded into the batch axis), so wall-clock drops by
    ~``n_bands``x at equal vector throughput.

    Approximation semantics: global FPS spreads samples uniformly in SPACE
    (density-independent); banded FPS allocates ``npoint / n_bands`` samples
    per equal-POPULATION Morton band, i.e. sampling becomes locally
    density-proportional across bands while staying farthest-point uniform
    within each band. Quality is measured alongside the other window-mode
    approximations in golden/extended_quality.json. Reference anchor: the
    sequential CUDA FPS this replaces (modules/pointnet2_utils.py:84-109) has
    no scalable variant; this is the SURVEY §5 "grid-hash neighbour search"
    class of large-scene escape.

    Args:
      points: ``[B, N, C]``, Morton-sorted along N (caller's responsibility).
      npoint: total samples; must divide by ``n_bands``.
      n_bands: contiguous index bands; 1 = exact ``farthest_point_sample``.
      key/start_idx/use_pallas: as ``farthest_point_sample`` (a random start
        is drawn independently per band).

    Returns:
      ``[B, npoint]`` int32 indices, grouped by band in index order (each
      band's block internally in selection order).
    """
    B, N, C = points.shape
    if n_bands <= 1:
        return farthest_point_sample(
            points, npoint, key=key, start_idx=start_idx, use_pallas=use_pallas
        )
    if N % n_bands or npoint % n_bands:
        raise ValueError(
            f"n_bands={n_bands} must divide N={N} and npoint={npoint}"
        )
    nb, pb = N // n_bands, npoint // n_bands
    local = farthest_point_sample(
        points.reshape(B * n_bands, nb, C),
        pb,
        key=key,
        start_idx=start_idx,
        use_pallas=use_pallas,
    ).reshape(B, n_bands, pb)
    offsets = (jnp.arange(n_bands, dtype=jnp.int32) * nb)[None, :, None]
    return (local + offsets).reshape(B, npoint)
