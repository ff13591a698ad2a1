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
    """ZerO init for a Dense kernel ``[in, out]`` (Zhao et al., reference
    util/utils.py:28-42). The reference runs Algorithm 1 on the torch weight
    ``[out, in]`` (m = out_features); we build that matrix and transpose into
    flax layout, so the Hadamard branch triggers on out > in exactly as the
    reference does."""
    in_dim, out_dim = shape[-2], shape[-1]
    if out_dim <= in_dim:
        w = np.eye(out_dim, in_dim)  # torch eye(m, n), m <= n
    else:
        clog = int(np.ceil(np.log2(out_dim)))
        p = 2**clog
        h = _hadamard(p) / (2 ** (clog / 2))
        w = np.eye(out_dim, p) @ h @ np.eye(p, in_dim)
    return jnp.asarray(w.T, dtype)


def xavier_init():
    return jax.nn.initializers.glorot_normal()


def kaiming_init():
    return jax.nn.initializers.he_normal()


def apply_weight_init(params, init_type: str, key: jax.Array):
    """Re-initialize a flax param tree the way the reference's
    ``model.apply(weight_init)`` does (util/utils.py:45-61,
    tool/train_cls_scanobjectnn.py:200-202): Dense/conv kernels get
    xavier/kaiming/ZerO, their biases 0; norm scales 1, norm biases 0.

    ``init_type``: 'xavier' | 'kaiming' | 'zero' (case-insensitive; 'ZerO'
    accepted). Returns a new param tree.
    """
    import flax

    init_type = init_type.lower()
    if init_type not in ("xavier", "kaiming", "zero"):
        raise ValueError(f"no such init type: {init_type}")
    if init_type == "xavier":
        dense_init = xavier_init()
    elif init_type == "kaiming":
        dense_init = kaiming_init()
    else:
        dense_init = zero_init_dense

    flat = flax.traverse_util.flatten_dict(params)
    out, i = {}, 0
    for path, leaf in sorted(flat.items()):
        name = path[-1]
        if name == "kernel" and (leaf.ndim == 2 or init_type != "zero"):
            out[path] = dense_init(jax.random.fold_in(key, i), leaf.shape, leaf.dtype)
            i += 1
        elif name == "scale":  # norm affine weight -> 1 (flax default, kept explicit)
            out[path] = jnp.ones_like(leaf)
        elif name == "bias":
            out[path] = jnp.zeros_like(leaf)
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)
