"""Learning-rate schedules.

Reference semantics: StepLR(step_size=20, gamma=0.7) for classification
(tool/train_cls_scanobjectnn.py:205-222) and CosineAnnealingLR(T_max=300,
eta_min=1e-3) for part-seg (tool/train_partseg.py:148-153). The reference
calls ``scheduler.step()`` BEFORE the first epoch's batches
(tool/train_cls_scanobjectnn.py:238) so epoch e trains at
``lr0 * gamma^floor((e+1)/step)`` — reproduced by ``epoch_offset=1`` for
strict-parity runs (the quirk is flagged; offset=0 is the sane default).
Schedules are per-epoch functions; pair with ``optax.inject_hyperparams`` or
recompute per epoch on the host.
"""

from __future__ import annotations

import jax.numpy as jnp


def step_decay_schedule(
    base_lr: float, step_size: int, gamma: float, *, epoch_offset: int = 0
):
    def schedule(epoch):
        return base_lr * gamma ** jnp.floor((epoch + epoch_offset) / step_size)

    return schedule


def cosine_schedule(base_lr: float, total_epochs: int, eta_min: float = 0.0):
    def schedule(epoch):
        t = jnp.clip(epoch / total_epochs, 0.0, 1.0)
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))

    return schedule
