"""Neighbour gather with a Pallas scatter-add BACKWARD.

The forward ``take_along_axis`` gather is fast on TPU, but its VJP is an XLA
scatter-add — profiled at ~3.5 ms per scale-0 attention gather in the
part-seg backward (4+ of them per step). This module keeps the XLA gather
forward and replaces only the backward with the one-hot-matmul trick: tile
the output (source) points, build the [S_chunk, N_tile] claim mask with a
vector comparison, and accumulate ``mask^T @ grads`` on the MXU across
S-chunks (grid revisits each output tile; Pallas iterates the minor grid dim
innermost so accumulation is sequential).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _scatter_add_kernel(g_ref, idx_ref, out_ref, *, precision: str = "hilo"):
    """g_ref: [1, Sc, C] grads; idx_ref: [1, Sc, 1] targets; out tile:
    [1, Nt, C], accumulated across the S-chunk grid dimension."""
    _, Sc, C = g_ref.shape
    _, Nt, _ = out_ref.shape
    n0 = pl.program_id(1) * Nt
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros((Nt, C), jnp.float32)

    g = g_ref[0, :, :]
    idx = idx_ref[0, :, :]  # [Sc, 1]
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (Sc, Nt), 1) + n0
    mask = (idx == n_ids).astype(jnp.float32)  # [Sc, Nt]

    dn = (((0,), (0,)), ((), ()))
    if precision == "bf16":
        # One MXU pass: inputs rounded to bf16 (~0.4% rel), f32 accumulation.
        # Used for GRADIENT scatters where the rounding is far below SGD noise
        # and the pass count dominates the step time.
        acc = jax.lax.dot_general(
            mask, g.astype(jnp.bfloat16).astype(jnp.float32),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    else:
        # bf16 hi/lo split: mask entries are exact 0/1, so only g needs help —
        # two default passes instead of HIGHEST's six, ~fp32 accuracy.
        g_hi = g.astype(jnp.bfloat16).astype(jnp.float32)
        g_lo = g - g_hi
        acc = jax.lax.dot_general(
            mask, g_hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            mask, g_lo, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
    out_ref[0, :, :] += acc


@functools.partial(jax.jit, static_argnames=("num_points", "precision"))
def scatter_add_pallas(grads, idx, num_points: int, precision: str = "hilo"):
    """sum-scatter: out[b, idx[b, s]] += grads[b, s].
    grads ``[B, S', C]``, idx ``[B, S']`` -> ``[B, num_points, C]``.
    precision: 'hilo' (~fp32 exact, 2 MXU passes) or 'bf16' (1 pass,
    inputs rounded to bf16 — for gradient scatters)."""
    B, Sp, C = grads.shape
    Nt = max(128, min(512, _round_up(num_points, 128)))
    Npad = _round_up(num_points, Nt)
    Sc = min(2048, _round_up(Sp, 8))
    Spad = _round_up(Sp, Sc)

    g = grads.astype(jnp.float32)
    ix = idx.astype(jnp.int32)
    if Spad != Sp:
        g = jnp.pad(g, ((0, 0), (0, Spad - Sp), (0, 0)))
        # pad targets out of range so they never match a tile
        ix = jnp.pad(ix, ((0, 0), (0, Spad - Sp)), constant_values=Npad + 1)
    ix = ix[..., None]  # [B, Spad, 1]

    out = pl.pallas_call(
        functools.partial(_scatter_add_kernel, precision=precision),
        grid=(B, Npad // Nt, Spad // Sc),
        in_specs=[
            pl.BlockSpec((1, Sc, C), lambda b, n, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sc, 1), lambda b, n, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Nt, C), lambda b, n, s: (b, n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Npad, C), jnp.float32),
    )(g, ix)
    return out[:, :num_points, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_impl(points, idx, n_points: int):
    B = points.shape[0]
    C = points.shape[-1]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(
        points, flat[..., None], axis=1, mode="promise_in_bounds"
    )
    return out.reshape((B,) + idx.shape[1:] + (C,))


def _fwd(points, idx, n_points: int):
    # 0-size residual carries points' dtype (shapes/dtypes aren't jax types).
    return _gather_impl(points, idx, n_points), (
        idx,
        jnp.zeros((0,), points.dtype),
    )


def _bwd(n_points: int, res, g):
    idx, dtype_probe = res
    B = g.shape[0]
    C = g.shape[-1]
    flat_idx = idx.reshape(B, -1)
    flat_g = g.reshape(B, -1, C)
    if jax.default_backend() == "tpu" and flat_idx.shape[1] * n_points >= 1_000_000:
        dp = scatter_add_pallas(flat_g, flat_idx, n_points)
    else:
        batch_offset = jnp.arange(B, dtype=jnp.int32)[:, None] * n_points
        seg = (flat_idx.astype(jnp.int32) + batch_offset).reshape(-1)
        dp = jax.ops.segment_sum(
            flat_g.reshape(-1, C), seg, num_segments=B * n_points
        ).reshape(B, n_points, C)
    return dp.astype(dtype_probe.dtype), None


_gather_impl.defvjp(_fwd, _bwd)


def gather_neighbors(points, idx):
    """``points [B, N, C]``, ``idx [B, *group]`` -> gathered ``[B, *group, C]``
    — identical to ops.index_points, but the VJP scatter-add runs as the
    Pallas one-hot matmul instead of an XLA scatter (size-thresholded)."""
    return _gather_impl(points, idx, points.shape[1])
