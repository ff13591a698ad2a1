"""Losses.

Reference semantics: ``SmoothClsLoss`` (util/utils.py:74-88) — label-smoothed
(eps=0.1) NLL over log-probabilities, off-class mass eps/(n_class-1);
``ClsLoss`` (util/utils.py:64-71) — plain NLL; part-seg ``get_loss``
(models/repsurf/pointnet2_part_seg_msg.py:159-180) — the same smoothed CE over
flattened per-point logits. (The snapshot-only ``get_loss2`` BCE
mutual-information auxiliary is dead — its inputs are never produced by the
live forward; documented as excluded, SURVEY.md §2.5.)
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_cls_loss(
    log_probs: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Label-smoothed NLL. log_probs ``[B, C]`` (already log-softmaxed),
    labels ``[B]`` int."""
    n_class = log_probs.shape[-1]
    one_hot = jnp.zeros_like(log_probs).at[
        jnp.arange(log_probs.shape[0]), labels
    ].set(1.0)
    smoothed = one_hot * (1.0 - smoothing) + (1.0 - one_hot) * smoothing / (
        n_class - 1
    )
    return -jnp.mean(jnp.sum(smoothed * log_probs, axis=-1))


def cls_loss(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Plain NLL over log-probabilities (reference ``ClsLoss``)."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)
    return -jnp.mean(picked)


def chamfer_distance(
    pred: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Symmetric squared Chamfer distance between clouds ``[B, N, 3]`` and
    ``[B, M, 3]`` (completion-head training objective; the reference ships no
    completion code — SURVEY.md §0). Pairwise distances ride the MXU."""
    from mpa_tpu.ops.pairwise import square_distance

    d = square_distance(pred, target)  # [B, N, M]
    return jnp.mean(jnp.min(d, axis=-1)) + jnp.mean(jnp.min(d, axis=-2))


def smooth_seg_loss(
    log_probs: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Per-point label-smoothed NLL. log_probs ``[B, N, P]``, labels ``[B, N]``."""
    B, N, P = log_probs.shape
    return smooth_cls_loss(
        log_probs.reshape(B * N, P), labels.reshape(B * N), smoothing
    )
