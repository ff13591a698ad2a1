"""Seeding and weight initialization.

Reference semantics: ``set_seed`` (util/utils.py:12-25 — all RNGs + cudnn
determinism knobs; on TPU determinism is the default, so this just builds the
root PRNG key) and ``ZerO_Init_on_matrix`` / ``weight_init``
(util/utils.py:28-61): Hadamard-identity ZerO init plus xavier/kaiming
dispatch, exposed as flax initializers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """One seed -> the root key; every consumer folds in a stable tag.
    (numpy legacy global seeding included for host-side shuffles.)"""
    np.random.seed(seed)
    return jax.random.key(seed)


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def zero_init_dense(key, shape, dtype=jnp.float32):
    """ZerO init for a Dense kernel [in, out] (Zhao et al., reference
    util/utils.py:28-42): identity when square-ish, clipped/padded
    Hadamard-scaled partial identity otherwise."""
    in_dim, out_dim = shape[-2], shape[-1]
    if in_dim <= out_dim:
        w = np.eye(in_dim, out_dim)
    else:
        clog = int(np.ceil(np.log2(in_dim)))
        p = 2**clog
        h = _hadamard(p) / (2 ** (clog / 2))
        w = (np.eye(in_dim, p) @ h @ np.eye(p, out_dim))
    return jnp.asarray(w, dtype)


def xavier_init():
    return jax.nn.initializers.glorot_normal()


def kaiming_init():
    return jax.nn.initializers.he_normal()
