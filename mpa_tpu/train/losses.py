"""Losses.

Reference semantics: ``SmoothClsLoss`` (util/utils.py:74-88) — label-smoothed
(eps=0.1) NLL over log-probabilities, off-class mass eps/(n_class-1);
``ClsLoss`` (util/utils.py:64-71) — plain NLL; part-seg ``get_loss``
(models/repsurf/pointnet2_part_seg_msg.py:159-180) — the same smoothed CE over
flattened per-point logits; ``mi_aux_loss`` — the snapshot-only ``get_loss2``
BCE mutual-information auxiliary (log/part_seg/res/pointnet2_part_seg_msg.py:
182-227; dead in the live forward, provided for completeness).
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

    # Distances are consumed as VALUES here (min + mean), not as top-k
    # ordering, so accumulation follows the input dtype (f64 under the x64
    # sharded-parity tests; f32 pinning would silently downgrade them).
    acc = jnp.promote_types(jnp.float32, pred.dtype)
    d = square_distance(pred, target, acc_dtype=acc)  # [B, N, M]
    return jnp.mean(jnp.min(d, axis=-1)) + jnp.mean(jnp.min(d, axis=-2))


def completion_loss(out, target: jnp.ndarray) -> jnp.ndarray:
    """Completion objective for the (coarse, fine) two-stage decoder:
    unweighted sum of both stages' Chamfer to the full cloud (the single
    definition used by training, the benchmark, and the multi-chip dryrun)."""
    coarse, fine = out
    return chamfer_distance(coarse, target) + chamfer_distance(fine, target)


def smooth_seg_loss(
    log_probs: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Per-point label-smoothed NLL. log_probs ``[B, N, P]``, labels ``[B, N]``."""
    B, N, P = log_probs.shape
    return smooth_cls_loss(
        log_probs.reshape(B * N, P), labels.reshape(B * N), smoothing
    )


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean BCE on logits (torch BCEWithLogitsLoss):
    mean(max(x, 0) - x*t + log1p(exp(-|x|)))."""
    x, t = logits.astype(jnp.float32), targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def mi_aux_loss(
    ret2: jnp.ndarray, ret3: jnp.ndarray, ret4: jnp.ndarray
) -> jnp.ndarray:
    """Mutual-information auxiliary loss of the golden part-seg snapshot.

    Reference semantics: ``get_loss2`` at
    log/part_seg/res/pointnet2_part_seg_msg.py:182-227 — each ``ret`` tensor
    ``[B, 2M]`` holds M "positive-pair" scores followed by M "negative-pair"
    scores; BCE-with-logits against [ones(M), zeros(M)] per scale, averaged
    over the three scales. The snapshot trainer instantiates it
    (log/part_seg/res/train_partseg.py:101) but the live forward never
    produces its inputs, so it is an optional auxiliary here, not wired into
    any model's default loss.
    """

    def one(ret):
        m = ret.shape[1] // 2
        t = jnp.concatenate(
            [jnp.ones((ret.shape[0], m)), jnp.zeros((ret.shape[0], m))], axis=1
        )
        return _bce_with_logits(ret, t)

    return (one(ret2) + one(ret3) + one(ret4)) / 3.0
