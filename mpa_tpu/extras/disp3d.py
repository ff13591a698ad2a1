"""Displacement-kernel convolutions (orphaned experiment, reference
modules/disp3d.py:56-268).

Operator3D: learned 3D displacement directions score each neighbour offset
(ReLU of the dot product), max over neighbours per (support, kernel), weighted
sum over supports. OperatorND: the feature-map generalization — per-point
features project to (support+1) x out channels; the support channels gather to
neighbours, gate by the displacement scores, max over neighbours, and sum with
the centre term. NeighborPooling: neighbour max-pool. Disp3DEncoder: the
stacked encoder sketch from the reference's commented-out ``Disp3D``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops import knn, index_points


def _neighbor_displacement(vertices, idx):
    neigh = index_points(vertices, idx)  # [B, N, K, 3]
    return neigh - vertices[:, :, None, :]


class Operator3D(nn.Module):
    kernel_num: int
    support_num: int

    @nn.compact
    def __call__(self, neighbor_index, vertices):
        """idx ``[B, N, K]``, vertices ``[B, N, 3]`` -> ``[B, N, kernel_num]``."""
        B, N, K = neighbor_index.shape
        s, k = self.support_num, self.kernel_num
        stdv = 1.0 / jnp.sqrt(s * k)
        disp = self.param(
            "displacement", nn.initializers.uniform(2 * stdv), (3, s * k)
        ) - stdv
        weights = self.param(
            "weights", nn.initializers.uniform(2 * stdv), (1, 1, s, k)
        ) - stdv
        nd = _neighbor_displacement(vertices, neighbor_index)  # [B, N, K, 3]
        theta = jax.nn.relu(nd @ disp).reshape(B, N, K, s, k)
        theta = jnp.max(theta, axis=2) * weights  # [B, N, s, k]
        return jnp.sum(theta, axis=2)


class OperatorND(nn.Module):
    out_channel: int
    support_num: int

    @nn.compact
    def __call__(self, neighbor_index, vertices, feature_map):
        """idx ``[B, N, K]``, vertices ``[B, N, 3]``, features ``[B, N, Cin]``
        -> ``[B, N, out_channel]``."""
        B, N, K = neighbor_index.shape
        s, o = self.support_num, self.out_channel
        stdv = 1.0 / jnp.sqrt(o * (s + 1))
        disp = self.param(
            "displacement", nn.initializers.uniform(2 * stdv), (3, s * o)
        ) - stdv
        nd = _neighbor_displacement(vertices, neighbor_index)
        theta = jax.nn.relu(nd @ disp)  # [B, N, K, s*o]

        fout = nn.Dense((s + 1) * o, name="weights")(feature_map)
        centre, support = fout[..., :o], fout[..., o:]
        support = index_points(support, neighbor_index)  # [B, N, K, s*o]
        act = (theta * support).reshape(B, N, K, s, o)
        act = jnp.sum(jnp.max(act, axis=2), axis=2)  # [B, N, o]
        return centre + act


class NeighborPooling(nn.Module):
    """Max over each point's K neighbours (reference disp3d Pooling)."""

    @nn.compact
    def __call__(self, neighbor_index, feature_map):
        return jnp.max(index_points(feature_map, neighbor_index), axis=2)


class Disp3DEncoder(nn.Module):
    """Stacked displacement encoder: Operator3D stem + OperatorND blocks with
    interleaved neighbour pooling -> per-point features."""

    widths: Sequence[int] = (32, 64, 128)
    support_num: int = 1
    k: int = 16

    @nn.compact
    def __call__(self, vertices, *, train: bool = True, rng: Optional[jax.Array] = None):
        _, idx = knn(self.k, vertices, vertices)
        x = Operator3D(self.widths[0], self.support_num, name="op0")(idx, vertices)
        for i, w in enumerate(self.widths[1:]):
            x = jax.nn.relu(x)
            x = OperatorND(w, self.support_num, name=f"op{i + 1}")(idx, vertices, x)
            x = NeighborPooling(name=f"pool{i + 1}")(idx, x)
        return x
