"""DGCNN EdgeConv classifier (orphaned baseline, reference modules/dgcnn.py:20-119).

Four stacked EdgeConv blocks — kNN graph recomputed in FEATURE space at every
block, edge features ``concat(x_j - x_i, x_i)``, shared 1x1 conv + BN +
LeakyReLU(0.2), max over the k neighbours — then a 1024-wide fuse conv over
the concatenated block outputs, global max+avg pooling, FC head.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops import knn, index_points
from mpa_tpu.models.registry import register_model


def get_graph_feature(x: jnp.ndarray, k: int = 20) -> jnp.ndarray:
    """``[B, N, C]`` -> edge features ``[B, N, k, 2C]``: (neighbour - centre,
    centre), neighbours by feature-space kNN (reference dgcnn.py:29-53)."""
    _, idx = knn(k, x, x)
    neigh = index_points(x, idx)  # [B, N, k, C]
    centre = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - centre, centre], axis=-1)


class _EdgeConv(nn.Module):
    features: int
    k: int

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        e = get_graph_feature(x, self.k)
        e = nn.Dense(self.features, use_bias=False, name="conv")(e)
        e = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn"
        )(e)
        e = jax.nn.leaky_relu(e, negative_slope=0.2)
        return jnp.max(e, axis=2)


class DGCNN(nn.Module):
    num_classes: int = 13
    k: int = 20
    block_widths: Sequence[int] = (64, 64, 128, 256)
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, points, *, train: bool = True, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        x = points[..., :3]
        blocks = []
        for i, w in enumerate(self.block_widths):
            x = _EdgeConv(w, self.k, name=f"edge{i + 1}")(x, train=train)
            blocks.append(x)
        x = jnp.concatenate(blocks, axis=-1)
        x = nn.Dense(1024, use_bias=False, name="conv5")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn5"
        )(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        g = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)

        g = nn.Dense(512, use_bias=False, name="linear1")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn6"
        )(g)
        g = jax.nn.leaky_relu(g, negative_slope=0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = nn.Dense(256, name="linear2")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn7"
        )(g)
        g = jax.nn.leaky_relu(g, negative_slope=0.2)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        return nn.Dense(self.num_classes, name="linear3")(g)


@register_model("dgcnn")
def _dgcnn(**kw) -> DGCNN:
    return DGCNN(**kw)
