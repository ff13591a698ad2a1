"""NetVLAD pooling (orphaned experiment, reference modules/loupe.py:6-147).

Soft-assignment VLAD: per-point cluster logits (Dense + BN) -> softmax over
clusters -> weighted residuals against learned cluster centres -> flattened
descriptor; SpatialPyramid wraps it with a projection + BN + context gating
(sigmoid gate over the output descriptor).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GatingContext(nn.Module):
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = x.shape[-1]
        gates = nn.Dense(dim, use_bias=not self.add_batch_norm, name="gating")(x)
        if self.add_batch_norm:
            gates = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn"
            )(gates)
        return x * jax.nn.sigmoid(gates)


class NetVLAD(nn.Module):
    cluster_size: int = 64
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        """x: ``[B, N, C]`` -> VLAD descriptor ``[B, C * cluster_size]``."""
        B, N, C = x.shape
        logits = nn.Dense(
            self.cluster_size, use_bias=not self.add_batch_norm, name="clusters"
        )(x)
        if self.add_batch_norm:
            logits = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn1"
            )(logits)
        assign = jax.nn.softmax(logits, axis=-1)  # [B, N, K]

        centres = self.param(
            "cluster_weights2",
            nn.initializers.normal(1.0 / jnp.sqrt(C)),
            (1, C, self.cluster_size),
        )
        a_sum = jnp.sum(assign, axis=1, keepdims=True)  # [B, 1, K]
        a = a_sum * centres  # [B, C, K]
        vlad = jnp.einsum("bnk,bnc->bck", assign, x) - a  # weighted residuals
        return vlad.reshape(B, C * self.cluster_size)


class SpatialPyramidNetVLAD(nn.Module):
    output_dim: int = 256
    cluster_size: int = 64
    gating: bool = True
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        v = NetVLAD(self.cluster_size, self.add_batch_norm, name="vlad0")(
            x, train=train
        )
        v = nn.Dense(self.output_dim, use_bias=False, name="hidden")(v)
        v = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, use_fast_variance=False, name="bn2"
        )(v)
        if self.gating:
            v = GatingContext(self.add_batch_norm, name="context_gating")(
                v, train=train
            )
        return v
