"""Difference-wise local attention — the paper's core "probability transition".

Reference semantics: ``LocalTrans`` (modules/repsurface_utils.py:448-540):
query from the centre point, keys/values from its K neighbours; per-channel
*vector* energy ``q - k``; softmax over K scaled by 1/sqrt(d); then every
weight has the column-sum (== 1 after softmax) subtracted, producing negative
"difference" weights; context is max over K of ``attention * value``; output
is residual + FFN(context).

TPU design notes:
- ``softmax - 1`` is folded analytically (the reference computes the K-sum of
  the softmax and subtracts it; that sum is identically 1).
- The whole query side of the attention is folded analytically: the softmax
  argument is ``(q_i - k_ij)/sqrt(C)``, and in both modes every i-dependent
  term is CONSTANT along the softmax (neighbour) axis —
  ``softmax_j(q_i - W_k x_j + W_k x_i - b_k) == softmax_j(-W_k x_j)``.
  So the attention weights are ``E_j / sum_{j' in N(i)} E_{j'}`` with
  ``E = exp(-(W_k x)/sqrt(C) - stab)`` computed ONCE PER SOURCE POINT
  ([N, C] node level), not per edge ([S, K, C]): the per-edge exp/sum/div
  softmax chain and the query matmul disappear from the hot path. ``stab`` is
  a per-(batch, channel) max — constant over any neighbour set, so it cancels
  too (the usual softmax stabilizer, hoisted to node level).
- The value projection in xyz mode is linear, so it also hoists to node level:
  ``W_v(x_j - x_i) + b_v = v(x_j) - (v(x_i) - b_v)`` — a gathered node-level
  term plus a per-query shift.
- e and v are PACKED into one [N, 2C] tensor and gathered together: TPU row
  gathers are row-count-bound (a [M, 3] gather costs the same as [M, 128]),
  so packing halves the gather bill; the VJP scatter-add (Pallas one-hot
  matmul) also runs once. ``node_pack``/``finish`` are exposed separately so
  LocalMerge can pack MULTIPLE branches that share one kNN index into a
  single gather (modules/pointnet2_utils.py:444-470: the xyz branch and the
  first feature branch both group by the spatial kNN).
- The q Dense is still created (zero analytic gradient, matching torch
  autograd on the reference) so checkpoints/transplants keep every leaf.
- The reference's ``usetanh`` branch is dead in every live call and its torch
  ``matmul`` is shape-inconsistent; here it is implemented as the evidently
  intended tanh(energy)/K weighting summed over K, and kept off by default
  (tanh is per-edge in q - k, so the fold does not apply; it keeps the
  edge-level path).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.ops.gather import index_points
from mpa_tpu.ops.pallas.attention_pallas import transition_attention
from mpa_tpu.nn.linear import LinearUnit


class LocalTrans(nn.Module):
    """One difference-attention transition from a source set to centre points.

    Call args:
      source: ``[B, N, C_in]`` neighbour source set (xyz or features).
      center: ``[B, S, C_in]`` centre/query features (already gathered to the
        target scale — the caller owns FPS gathering).
      idx: ``[B, S, K]`` neighbour indices into the source set.
      xyz_mode: geometric mode — k/v act on centre-relative deltas
        (reference ``xyz=True`` path; folded to node level, see module doc).
    """

    out_channels: int
    num_neighbors: int
    residual_proj: bool = False  # project the residual through conv_res
    use_tanh: bool = False
    dtype: Any = None  # compute dtype (bf16 mixed precision when set)

    def setup(self):
        self.q = nn.Dense(self.out_channels, dtype=self.dtype)
        self.k = nn.Dense(self.out_channels, dtype=self.dtype)
        self.v = nn.Dense(self.out_channels, dtype=self.dtype)
        if self.residual_proj:
            self.conv_res = LinearUnit(self.out_channels, norm="batch", dtype=self.dtype)
        self.ffn = LinearUnit(self.out_channels, norm="batch", dtype=self.dtype)

    def node_pack(self, source) -> jnp.ndarray:
        """Per-source-point attention inputs, packed ``[B, N, 2C]`` =
        ``[E || v(source)]`` with ``E = exp(-(W_k x)/sqrt(C) - stab)``."""
        k_src = self.k(source)
        v_src = self.v(source)
        neg = -k_src.astype(jnp.float32) / jnp.sqrt(float(self.out_channels))
        stab = jax.lax.stop_gradient(jnp.max(neg, axis=1, keepdims=True))
        e_src = jnp.exp(neg - stab).astype(v_src.dtype)
        return jnp.concatenate([e_src, v_src], axis=-1)

    def value_shift(self, center) -> jnp.ndarray:
        """xyz-mode per-query additive value shift:
        ``W_v(x_j - x_i) + b_v == v(x_j) + (b_v - v(x_i))``."""
        bias_v = self.v(jnp.zeros_like(center[:, :1, :]))  # [B, 1, C] = b_v
        return bias_v - self.v(center)

    def ffn_out(self, context, center, *, train: bool = True):
        """Residual + FFN head on a precomputed attention context."""
        _ = self.q(jax.lax.stop_gradient(center[:, :1, :]))  # params only
        residual = center
        if self.residual_proj:
            residual = self.conv_res(residual, train=train)
        return residual + self.ffn(context, train=train)

    def __call__(
        self, source, center, idx, *, xyz_mode: bool = False,
        train: bool = True, window_spec=None,
    ):
        if self.use_tanh:
            # Edge-level path (dead in live models): tanh(q - k) does not fold.
            if xyz_mode:
                neigh = index_points(source, idx) - center[:, :, None, :]
                key = self.k(neigh)
                value = self.v(neigh)
            else:
                key = index_points(self.k(source), idx)
                value = index_points(self.v(source), idx)
            energy = self.q(center)[:, :, None, :] - key
            attn = jnp.tanh(energy) / self.num_neighbors
            context = jnp.sum(attn * value, axis=2)
            residual = center
            if self.residual_proj:
                residual = self.conv_res(residual, train=train)
            return residual + self.ffn(context, train=train)

        packed = self.node_pack(source)
        shifts = self.value_shift(center) if xyz_mode else None
        if window_spec is not None:
            from mpa_tpu.ops.pallas.window_attention import (
                windowed_transition_attention,
            )

            context = windowed_transition_attention(
                packed, idx, shifts, 1, self.out_channels, window_spec
            )
        else:
            context = transition_attention(packed, idx, shifts, 1, self.out_channels)
        return self.ffn_out(context, center, train=train)
