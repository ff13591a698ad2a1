"""Fused pairwise-distance + top-k Pallas kernel.

Why a kernel: the XLA path materializes the [B, S, N] distance matrix in HBM
and then either full-sorts it (lax.top_k) or makes K masked passes over it —
at part-seg scale that is GBs of HBM traffic per step (profiled: ~45% of the
train step). Here each grid program loads a query tile and the full base set
into VMEM, computes the distance tile on the MXU, and runs the K
argmin-and-mask passes entirely on-chip; only [S, K] indices leave.

The kernel returns indices only (selection is non-differentiable); the
public wrapper recomputes the K selected distances with a differentiable
gather so gradients flow exactly as in the XLA path (3-NN interpolation
differentiates through distances).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Distance-matmul precision. 'hilo3' splits each f32 operand into a bf16 hi
# part and a bf16 residual and takes hi*hi + hi*lo + lo*hi — 3 MXU passes with
# ~2^-16 relative error on the cross term (the lo*lo term it drops is ~2^-24,
# f32-mantissa level), vs 6 passes for exact HIGHEST. Measured on v5e at the
# part-seg hot scale (B16, S=N=2048, C=256): 12% faster per call with 7e-5 of
# neighbour selections flipping, all on near-exact distance ties. 'highest'
# restores the bit-exact selection (Mosaic has no native HIGH).
DIST_MATMUL_PRECISION = "hilo3"


def _cross_matmul(q, b, precision: str):
    """q [Sq, C] . b^T [C, Npad] -> [Sq, Npad] f32."""
    dn = (((1,), (1,)), ((), ()))
    if precision == "highest":
        return jax.lax.dot_general(
            q, b, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    qh = q.astype(jnp.bfloat16)
    ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (
        jax.lax.dot_general(qh, bh, dimension_numbers=dn, preferred_element_type=f32)
        + jax.lax.dot_general(qh, bl, dimension_numbers=dn, preferred_element_type=f32)
        + jax.lax.dot_general(ql, bh, dimension_numbers=dn, preferred_element_type=f32)
    )


def _knn_kernel(base_ref, query_ref, idx_ref, *, k: int, n_valid: int, precision: str):
    """base_ref: [1, Npad, C]; query_ref: [1, Sq, C]; idx_ref: [1, Sq, k]."""
    _, Npad, C = base_ref.shape
    _, Sq, _ = query_ref.shape
    b = base_ref[0, :, :]
    q = query_ref[0, :, :]

    # Distance tile on the MXU: ||q||^2 + ||b||^2 - 2 q b^T.
    cross = _cross_matmul(q, b, precision)  # [Sq, Npad]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [Sq, 1]
    b2 = jnp.sum(b * b, axis=1, keepdims=True).reshape(1, Npad)
    d = q2 + b2 - 2.0 * cross

    lane = jax.lax.broadcasted_iota(jnp.int32, (Sq, Npad), 1)
    d = jnp.where(lane < n_valid, d, jnp.inf)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (Sq, k), 1)

    # Selection: explicit min / tie-lowest-index / mask-update passes. Mosaic
    # lowers this ~2.4x faster than argmin-in-a-fori_loop (measured on v5e:
    # 2.8 -> 1.2 ms for B16 S=N=2048); unrolled for the common small k so the
    # loop bookkeeping vanishes.
    def body(j, carry):
        cur, sel = carry
        m = jnp.min(cur, axis=1, keepdims=True)
        i = jnp.min(jnp.where(cur == m, lane, Npad), axis=1, keepdims=True)
        cur = jnp.where(lane == i, jnp.inf, cur)
        sel = jnp.where(out_lane == j, i.astype(jnp.int32), sel)
        return cur, sel

    carry = (d, jnp.zeros((Sq, k), jnp.int32))
    if k <= 16:
        for j in range(k):
            carry = body(j, carry)
    else:
        carry = jax.lax.fori_loop(0, k, body, carry)
    idx_ref[0, :, :] = carry[1]


@functools.partial(jax.jit, static_argnames=("k", "s_tile", "precision"))
def knn_indices_pallas(
    k: int,
    base: jnp.ndarray,
    query: jnp.ndarray,
    s_tile: int = 0,
    precision: str | None = None,
) -> jnp.ndarray:
    """Exact k-smallest-distance indices. base ``[B, N, C]``, query
    ``[B, S, C]`` -> ``[B, S, k]`` int32 (ascending distance, ties by lowest
    index — identical to lax.top_k ordering up to DIST_MATMUL_PRECISION;
    pass precision='highest' for bit-exact parity runs)."""
    B, N, C = base.shape
    S = query.shape[1]
    Npad = _round_up(N, 128)
    if not s_tile:
        # Working set ~ 2 copies of the [Sq, Npad] f32 tile + the i32 iota;
        # keep it around half of the 16MB VMEM.
        s_tile = max(8, min(512, (4 * 1024 * 1024) // (Npad * 4) // 8 * 8))
    Sq = min(s_tile, _round_up(S, 8))
    Spad = _round_up(S, Sq)

    basep = base.astype(jnp.float32)
    queryp = query.astype(jnp.float32)
    if Npad != N:
        basep = jnp.pad(basep, ((0, 0), (0, Npad - N), (0, 0)))
    if Spad != S:
        queryp = jnp.pad(queryp, ((0, 0), (0, Spad - S), (0, 0)))

    kernel = functools.partial(
        _knn_kernel, k=k, n_valid=N,
        precision=precision or DIST_MATMUL_PRECISION,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, Spad // Sq),
        in_specs=[
            pl.BlockSpec((1, Npad, C), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sq, C), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Sq, k), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Spad, k), jnp.int32),
    )(basep, queryp)
    return out[:, :S, :]


def knn_pallas(
    k: int, base: jnp.ndarray, query: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.knn on TPU: (sqr_dists [B,S,k] differentiable, idx)."""
    # Selection is non-differentiable: detach the kernel INPUTS (detaching only
    # the output still asks autodiff to linearize through the pallas_call).
    idx = knn_indices_pallas(
        k, jax.lax.stop_gradient(base), jax.lax.stop_gradient(query)
    )
    # Differentiable re-computation of the selected distances.
    B, S, _ = query.shape
    flat = idx.reshape(B, S * k)
    gathered = jnp.take_along_axis(
        base, flat[..., None], axis=1, mode="promise_in_bounds"
    ).reshape(
        B, S, k, base.shape[-1]
    )
    d = jnp.sum((query[:, :, None, :] - gathered) ** 2, axis=-1)
    return d, idx
