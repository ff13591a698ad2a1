"""Fused radius (ball) grouping kernel.

The XLA ball_query path (ops/ball_query.py) materializes the full [B, S, N]
marked-index tensor and hands it to ``lax.top_k``, which TPU lowers to a
FULL SORT along N — profiled at 7.35 ms/step on repsurf_ssg_2x (B64,
S512/N1024, nsample24), the single largest op of that model's step. Same
cure as the exact kNN (knn_pallas.py): fuse the MXU distance tile with an
iterative min-pass selection in VMEM, so no [B, S, N] tensor reaches HBM
and no sort happens at all.

Semantics (identical to ops.ball_query, reference
modules/pointnet2_utils.py:112-134): for each query centre, the ``nsample``
LOWEST-index base points within ``radius``; empty slots carry the sentinel N
(the caller backfills with the first hit). Integer keys are unique, so
selection needs no tie handling: each pass takes the min key, retires that
lane, and records it. Exhausted centres keep yielding the sentinel — the
min over all-sentinel lanes IS the sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpa_tpu.ops.pallas.knn_pallas import _cross_matmul, _round_up, DIST_MATMUL_PRECISION


def _ball_kernel(
    base_ref, query_ref, idx_ref, *, nsample: int, n_valid: int, r2: float,
    precision: str,
):
    """base_ref: [1, Npad, C]; query_ref: [1, Sq, C]; idx_ref: [1, Sq, nsample]
    (sentinel ``n_valid`` where a centre has fewer than nsample hits)."""
    _, Npad, C = base_ref.shape
    _, Sq, _ = query_ref.shape
    b = base_ref[0, :, :]
    q = query_ref[0, :, :]

    cross = _cross_matmul(q, b, precision)  # [Sq, Npad]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).reshape(1, Npad)
    d = q2 + b2 - 2.0 * cross

    lane = jax.lax.broadcasted_iota(jnp.int32, (Sq, Npad), 1)
    # In-radius base points keep their index; padding and out-of-radius rows
    # carry the sentinel (n_valid == the caller-visible N).
    key = jnp.where((lane < n_valid) & (d <= r2), lane, n_valid)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (Sq, nsample), 1)

    def body(j, carry):
        cur, sel = carry
        m = jnp.min(cur, axis=1, keepdims=True)  # lowest remaining index
        cur = jnp.where(cur == m, n_valid, cur)  # retire it (indices unique)
        sel = jnp.where(out_lane == j, m, sel)
        return cur, sel

    carry = (key, jnp.zeros((Sq, nsample), jnp.int32))
    if nsample <= 16:
        for j in range(nsample):
            carry = body(j, carry)
    else:
        carry = jax.lax.fori_loop(0, nsample, body, carry)
    idx_ref[0, :, :] = carry[1]


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "s_tile", "precision"))
def ball_query_indices_pallas(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    s_tile: int = 0,
    precision: str | None = None,
) -> jnp.ndarray:
    """``[B, S, nsample]`` int32 group indices with sentinel N for empty
    slots (caller backfills). xyz ``[B, N, C]``, new_xyz ``[B, S, C]``."""
    B, N, C = xyz.shape
    S = new_xyz.shape[1]
    Npad = _round_up(N, 128)
    if not s_tile:
        # Working set ~ the f32 distance tile + the i32 key tile per chunk;
        # same half-VMEM budget heuristic as knn_indices_pallas.
        s_tile = max(8, min(512, (4 * 1024 * 1024) // (Npad * 4) // 8 * 8))
    Sq = min(s_tile, _round_up(S, 8))
    Spad = _round_up(S, Sq)

    basep = xyz.astype(jnp.float32)
    queryp = new_xyz.astype(jnp.float32)
    if Npad != N:
        basep = jnp.pad(basep, ((0, 0), (0, Npad - N), (0, 0)))
    if Spad != S:
        queryp = jnp.pad(queryp, ((0, 0), (0, Spad - S), (0, 0)))

    kernel = functools.partial(
        _ball_kernel, nsample=nsample, n_valid=N, r2=float(radius) ** 2,
        precision=precision or DIST_MATMUL_PRECISION,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, Spad // Sq),
        in_specs=[
            pl.BlockSpec((1, Npad, C), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sq, C), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Sq, nsample), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Spad, nsample), jnp.int32),
    )(basep, queryp)
    return out[:, :S, :]
