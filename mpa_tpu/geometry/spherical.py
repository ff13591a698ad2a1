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
    r2 = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    zero = r2 == 0.0
    # Double-where: sqrt/div at exactly 0 have NaN/inf VJPs even when the
    # forward is masked (self-match offsets in grouped coords ARE exactly 0).
    rho = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, r2)))
    z = xyz[..., 2:3]
    # Guard the division *and* clamp into acos domain against fp overshoot
    # (|ratio| == 1 also has an infinite arccos derivative at the poles).
    ratio = jnp.clip(
        z / jnp.where(zero, 1.0, rho), -1.0 + 1e-7, 1.0 - 1e-7
    )
    theta = jnp.where(zero, 0.0, jnp.arccos(ratio))
    # atan2(0, 0) has a NaN gradient (0/0); substitute x=1 on the z-axis —
    # the forward value (0) is unchanged, matching torch's atan2(0, 0) == 0.
    x, y = xyz[..., 0:1], xyz[..., 1:2]
    on_axis = (x == 0.0) & (y == 0.0)
    phi = jnp.arctan2(y, jnp.where(on_axis, 1.0, x))
    if normalize:
        theta = theta / _PI
        phi = phi / (2.0 * _PI) + 0.5
    return jnp.concatenate([rho, theta, phi], axis=-1)


def convert_polar(neighbours: jnp.ndarray, center: jnp.ndarray):
    """Per-axis polar angle pairs of neighbour offsets.

    Reference semantics: ``convert_polar`` (modules/pointnet2_utils.py:263-287,
    dead in live paths): for each axis, (alpha, beta) = azimuth in the
    orthogonal plane and elevation against it. NOTE the reference computes
    ``r_yz`` as sqrt(y^2 + y^2) — an obvious typo; implemented correctly here
    as sqrt(y^2 + z^2) and documented as a deliberate deviation.

    Args:
      neighbours/center: ``[B, N, K, 3]`` (centre broadcast over K).

    Returns:
      (x_alpha, x_beta, y_alpha, y_beta, z_alpha, z_beta), each ``[B, N, K]``.
    """
    rel = neighbours - center
    rel_x, rel_y, rel_z = rel[..., 0], rel[..., 1], rel[..., 2]
    r_xy = jnp.sqrt(rel_x**2 + rel_y**2)
    r_zx = jnp.sqrt(rel_z**2 + rel_x**2)
    r_yz = jnp.sqrt(rel_y**2 + rel_z**2)
    z_beta = jnp.arctan2(rel_z, r_xy)
    z_alpha = jnp.arctan2(rel_y, rel_x)
    y_beta = jnp.arctan2(rel_y, r_zx)
    y_alpha = jnp.arctan2(rel_x, rel_z)
    x_beta = jnp.arctan2(rel_x, r_yz)
    x_alpha = jnp.arctan2(rel_z, rel_y)
    return x_alpha, x_beta, y_alpha, y_beta, z_alpha, z_beta


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
