"""Difference-wise local attention — the paper's core "probability transition".

Reference semantics: ``LocalTrans`` (modules/repsurface_utils.py:448-540):
query from the centre point, keys/values from its K neighbours; per-channel
*vector* energy ``q - k``; softmax over K scaled by 1/sqrt(d); then every
weight has the column-sum (== 1 after softmax) subtracted, producing negative
"difference" weights; context is max over K of ``attention * value``; output
is residual + FFN(context).

TPU design notes:
- q/k/v projections are plain Denses; in feature mode k/v run on the *source*
  set first (one big MXU matmul) and are gathered afterwards — same algebra as
  the reference, and the gather fuses into the surrounding graph.
- ``softmax - 1`` is folded analytically (the reference computes the K-sum of
  the softmax and subtracts it; that sum is identically 1).
- The reference's ``usetanh`` branch is dead in every live call and its torch
  ``matmul`` is shape-inconsistent; here it is implemented as the evidently
  intended tanh(energy)/K weighting summed over K, and kept off by default.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops.gather import index_points
from mpa_tpu.nn.linear import LinearUnit


class LocalTrans(nn.Module):
    """One difference-attention transition from a source set to centre points.

    Call args:
      source: ``[B, N, C_in]`` neighbour source set (xyz or features).
      center: ``[B, S, C_in]`` centre/query features (already gathered to the
        target scale — the caller owns FPS gathering).
      idx: ``[B, S, K]`` neighbour indices into the source set.
      xyz_mode: geometric mode — k/v are centre-relative deltas projected
        *after* gathering (reference ``xyz=True`` path).
    """

    out_channels: int
    num_neighbors: int
    residual_proj: bool = False  # project the residual through conv_res
    use_tanh: bool = False
    dtype: Any = None  # compute dtype (bf16 mixed precision when set)

    @nn.compact
    def __call__(self, source, center, idx, *, xyz_mode: bool = False, train: bool = True):
        q = nn.Dense(self.out_channels, dtype=self.dtype, name="q")
        k = nn.Dense(self.out_channels, dtype=self.dtype, name="k")
        v = nn.Dense(self.out_channels, dtype=self.dtype, name="v")

        residual = center
        if self.residual_proj:
            residual = LinearUnit(self.out_channels, norm="batch", dtype=self.dtype, name="conv_res")(
                residual, train=train
            )

        if xyz_mode:
            # Gather raw neighbours, take centre-relative deltas, then project.
            neigh = index_points(source, idx) - center[:, :, None, :]
            key = k(neigh)
            value = v(neigh)
        else:
            # Project the whole source once on the MXU, gather afterwards.
            key = index_points(k(source), idx)
            value = index_points(v(source), idx)

        query = q(center)[:, :, None, :]  # [B, S, 1, C]
        energy = query - key  # [B, S, K, C]

        if self.use_tanh:
            attn = jnp.tanh(energy) / self.num_neighbors
            context = jnp.sum(attn * value, axis=2)
        else:
            attn = jax.nn.softmax(
                energy / jnp.sqrt(float(self.out_channels)), axis=2
            )
            # Reference subtracts the K-sum of the softmax — identically 1.
            attn = attn - 1.0
            context = jnp.max(attn * value, axis=2)

        out = residual + LinearUnit(self.out_channels, norm="batch", dtype=self.dtype, name="ffn")(
            context, train=train
        )
        return out
