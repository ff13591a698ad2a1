"""Batch-ingest point subsampling.

TPU-native replacements for the reference's missing ``sample(num_point, points,
cuda=)`` (tool/train_cls_scanobjectnn.py:22,244 — downsample each ``[B, C, N]``
batch to ``num_point`` at ingest; upstream RepSurf implements this as a random
subset at train time and a deterministic one at eval) and the dead
``random_sample`` (modules/pointnet2_utils.py:253-261).

Channel-last convention: inputs are ``[B, N, C]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def subsample_points(
    points: jnp.ndarray, num_point: int, *, key: Optional[jax.Array] = None
) -> jnp.ndarray:
    """Subsample a batch of clouds to ``num_point`` points.

    With a PRNG key: an independent uniform subset (without replacement) per
    cloud — the train-time behaviour. Without: the first ``num_point`` points —
    the deterministic eval behaviour.
    """
    B, N, C = points.shape
    if key is None:
        return points[:, :num_point, :]
    keys = jax.random.split(key, B)
    idx = jax.vmap(
        lambda k: jax.random.choice(
            k, N, shape=(num_point,), replace=False
        ).astype(jnp.int32)
    )(keys)
    return jnp.take_along_axis(points, idx[..., None], axis=1, mode="promise_in_bounds")


def random_sample(
    key: jax.Array, points: jnp.ndarray, num_point: int
) -> jnp.ndarray:
    """Alias of the stochastic mode of :func:`subsample_points`."""
    return subsample_points(points, num_point, key=key)


def shared_random_sample(key: jax.Array, points: jnp.ndarray, num_point: int):
    """Reference ``random_sample`` semantics (modules/pointnet2_utils.py:253-261,
    dead in live paths): ONE permutation shared across the batch; returns
    (sampled ``[B, n, C]``, idx ``[B, n]``)."""
    N = points.shape[1]
    perm = jax.random.permutation(key, N)[:num_point]
    sampled = points[:, perm, :]
    idx = jnp.broadcast_to(perm[None, :], (points.shape[0], num_point))
    return sampled, idx
