"""Cartesian → spherical / cylindrical coordinate transforms.

Reference semantics: ``xyz2sphere`` / ``xyz2cylind`` (modules/polar_utils.py:10-54):
spherical returns (rho, theta, phi) with theta normalized to [0,1] by 1/pi and
phi to [0,1] by 1/(2 pi)+0.5; rho==0 points get theta=0 (NaN guard).
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = jnp.pi


def xyz2sphere(xyz: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """``[..., 3]`` cartesian → ``[..., 3]`` (rho, theta, phi).

    theta in [0, pi] (or [0,1] normalized), phi in [-pi, pi] (or [0,1]).
    Degenerate rho==0 yields theta=0 instead of NaN.
    """
    rho = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True))
    z = xyz[..., 2:3]
    # Guard the division *and* clamp into acos domain against fp overshoot.
    safe_ratio = jnp.clip(z / jnp.where(rho == 0.0, 1.0, rho), -1.0, 1.0)
    theta = jnp.where(rho == 0.0, 0.0, jnp.arccos(safe_ratio))
    phi = jnp.arctan2(xyz[..., 1:2], xyz[..., 0:1])
    if normalize:
        theta = theta / _PI
        phi = phi / (2.0 * _PI) + 0.5
    return jnp.concatenate([rho, theta, phi], axis=-1)


def xyz2cylind(xyz: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """``[..., 3]`` cartesian → ``[..., 3]`` (rho, phi, z), rho clamped to [0,1],
    z to [-1,1] (reference modules/polar_utils.py:34-54; dead in the reference's
    live paths, kept for capability parity)."""
    rho = jnp.sqrt(jnp.sum(xyz[..., :2] ** 2, axis=-1, keepdims=True))
    rho = jnp.clip(rho, 0.0, 1.0)
    phi = jnp.arctan2(xyz[..., 1:2], xyz[..., 0:1])
    z = jnp.clip(xyz[..., 2:3], -1.0, 1.0)
    if normalize:
        phi = phi / (2.0 * _PI) + 0.5
        z = (z + 1.0) / 2.0
    return jnp.concatenate([rho, phi, z], axis=-1)
