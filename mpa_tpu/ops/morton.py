"""Morton (Z-order) spatial ordering for point arrays.

Support for the windowed fast path (ops/pallas/window_attention.py): when a
point array is sorted by Morton code, spatially-near points sit at nearby row
indices, so a query's k nearest neighbours fall inside a narrow, statically
addressable index band. The reference has no equivalent — its CUDA gathers
are index-agnostic (SURVEY.md §2.2); on TPU, arbitrary row gathers are the
dominant step cost, and locality ordering is what converts them into banded
matmuls.

All functions are jit-safe (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bits per axis. 3*10 = 30 bits fits int32 (sign bit unused: codes are >= 0).
_BITS = 10


def _spread_bits_3(x: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between each of the low 10 bits of ``x`` (int32)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(points: jnp.ndarray) -> jnp.ndarray:
    """Morton codes for ``[..., 3]`` coordinates -> int32 ``[...]``.

    Coordinates are min-max normalized per batch (leading axes up to the
    point axis) to the [0, 2^10) grid, so the code is invariant to the
    cloud's absolute position/scale.
    """
    xyz = points[..., :3].astype(jnp.float32)
    lo = jnp.min(xyz, axis=-2, keepdims=True)
    hi = jnp.max(xyz, axis=-2, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    q = ((xyz - lo) / span * (2**_BITS - 1) + 0.5).astype(jnp.int32)
    q = jnp.clip(q, 0, 2**_BITS - 1)
    return (
        _spread_bits_3(q[..., 0])
        | (_spread_bits_3(q[..., 1]) << 1)
        | (_spread_bits_3(q[..., 2]) << 2)
    )


def morton_order(points: jnp.ndarray) -> jnp.ndarray:
    """Permutation sorting ``[B, N, 3]`` points by Morton code -> ``[B, N]``
    int32 (ascending; ties by original index — jnp.argsort is stable)."""
    return jnp.argsort(morton_code(points), axis=-1).astype(jnp.int32)


def morton_sort(points: jnp.ndarray, *extras: jnp.ndarray):
    """Sort ``points`` (and any same-N-axis ``extras``) into Morton order.

    Returns ``(sorted_points, sorted_extras..., perm)`` where ``perm`` is the
    applied permutation (``sorted[i] = original[perm[i]]``). Invert with
    ``jnp.argsort(perm)`` to restore original row order on per-point outputs.
    """
    perm = morton_order(points)
    out = [jnp.take_along_axis(points, perm[..., None], axis=1)]
    for e in extras:
        idx = perm[..., None] if e.ndim == 3 else perm
        out.append(jnp.take_along_axis(e, idx, axis=1))
    return (*out, perm)
