"""Pairwise squared-distance — the root op under kNN / ball query / interpolation.

Reference semantics: ``square_distance`` at modules/pointnet2_utils.py:190-209
(dup modules/repsurface_utils.py:129-148): ||a-b||^2 expanded as
``sum(a^2) + sum(b^2) - 2 a.b^T`` so the O(N*M*C) term is a single matmul.
On TPU the matmul lands on the MXU; the rank-1 corrections fuse into it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(
    src: jnp.ndarray, dst: jnp.ndarray, *, acc_dtype=None
) -> jnp.ndarray:
    """Pairwise squared L2 distance.

    Args:
      src: ``[..., N, C]`` query points/features.
      dst: ``[..., M, C]`` base points/features.
      acc_dtype: accumulation dtype; None pins f32 — the default everywhere
        the distances feed top-k/argsort ORDERING, where stable f32 rounding
        must not drift with input widening (x64 test mode flips near-exact
        kNN ties otherwise). Value-consumers (Chamfer loss) pass a promoted
        dtype so x64 runs stay exact end to end.

    Returns:
      ``[..., N, M]`` squared distances (clamped at 0 against fp cancellation).
    """
    # -2 a.b^T on the MXU. Full fp32 (HIGHEST = 3-pass bf16 on TPU): distance
    # *ordering* feeds top-k selection, so bf16 default precision is not enough.
    acc = jnp.dtype(acc_dtype) if acc_dtype is not None else jnp.float32
    cross = jnp.einsum(
        "...nc,...mc->...nm",
        src,
        dst,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src.astype(acc) ** 2, axis=-1, keepdims=True)  # [..., N, 1]
    d2 = jnp.sum(dst.astype(acc) ** 2, axis=-1, keepdims=True)  # [..., M, 1]
    d2 = jnp.swapaxes(d2, -1, -2)  # [..., 1, M]
    out = s2 + d2 - 2.0 * cross
    return jnp.maximum(out, 0.0)


def inner_correlation(
    z: jnp.ndarray, index: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Cosine-similarity Gram matrix of a point/feature set.

    Reference semantics: ``inner_correlation`` at
    models/repsurf/repsurf_ssg_umb.py:25-32 (dead in the live forward there;
    provided as a first-class op for completeness): optionally gather rows by
    ``index``, L2-normalize the channel dim (torch ``F.normalize`` clamps the
    norm at 1e-12, replicated here), then form ``z_n @ z_n^T``.

    Args:
      z: ``[B, N, C]`` features.
      index: optional ``[B, S]`` (or ``[B, S, K]``) gather indices applied
        first (reference routes them through ``index_points``).

    Returns:
      ``[B, S, S]`` (or ``[B, N, N]``) cosine Gram matrix in fp32.
    """
    if index is not None:
        from mpa_tpu.ops.gather import index_points

        z = index_points(z, index)
    z = z.astype(jnp.float32)
    # Clamp INSIDE the sqrt: sqrt(max(.)) has a zero (not NaN) gradient on
    # the clamped branch, so degenerate all-zero rows stay differentiable.
    norm = jnp.sqrt(jnp.maximum(jnp.sum(z * z, axis=-1, keepdims=True), 1e-24))
    z_n = z / norm
    # Gram matmul on the MXU; HIGHEST because cosine similarities near 1
    # differ at the 1e-3 level for near-duplicate rows.
    return jnp.einsum(
        "...nc,...mc->...nm",
        z_n,
        z_n,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
