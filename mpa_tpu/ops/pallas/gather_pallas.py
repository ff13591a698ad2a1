"""Neighbour gather: Pallas loop-gather FORWARD + Pallas scatter-add BACKWARD.

Forward (r3): XLA's row gather is descriptor-rate-bound at a measured
~6-17 ns/row regardless of width. When the source slab fits VMEM, a Pallas
kernel that keeps the whole ``[N, W]`` slab resident and walks edges with
dynamic sublane slices (16 rows per loop iteration) sustains ~3.4 ns/row at
the model's shapes — bit-exact, ~2-3x the XLA rate at every (N, W) measured
(scripts/gather_microbench.py). ``loop_gather_rows`` is that kernel;
``_gather_impl`` dispatches to it whenever the slab fits.

Backward: an XLA scatter-add was profiled at ~3.5 ms per scale-0 attention
gather in the part-seg backward (4+ of them per step). Two Pallas paths by
destination size (measured crossover, scripts/scatter_microbench.py):
- N <= RMW_SCATTER_MIN_N: one-hot-matmul — tile the source points, build the
  [S_chunk, N_tile] claim mask with a vector comparison, accumulate
  ``mask^T @ grads`` on the MXU across S-chunks (grid revisits each output
  tile; the minor grid dim iterates innermost so accumulation is sequential).
- N >= RMW_SCATTER_MIN_N (one-hot FLOPs grow with N): read-modify-write loop
  into a VMEM-resident [N, W] accumulator — 7.5 vs 16 (one-hot) / 32 (XLA)
  ns/row at N=4096, exact f32 adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Loop gather: arbitrary row gather with the source slab resident in VMEM.
# ---------------------------------------------------------------------------

# Slab budget: [N, W] f32 source + [T, W] out block + double-buffering must
# fit scoped VMEM alongside the consumer's blocks.
LOOP_GATHER_MAX_SLAB_BYTES = 6 * 1024 * 1024
_LG_ROWS_PER_ITER = 16

# Batch-in-grid variant: one kernel launch with grid (B, E/T) instead of a
# vmap of B launches. Standalone (dispatch-bound) it measures 1.2-1.8x on
# shapes whose [B, E] i32 index prefetch fits SMEM — but IN-STEP, where XLA
# pipelines the per-batch launches, it is neutral-to-slightly-negative
# (22.26 vs 22.08 ms part-seg B8; scripts/gather_ab_batchgrid.py), so it is
# OFF by default. Set >0 (bytes of allowed [B, E] prefetch) to enable.
BATCHGRID_MAX_PREFETCH_BYTES = 0


def _loop_gather_kernel(idx_ref, src_ref, out_ref, *, T: int, rpi: int):
    base0 = pl.program_id(0) * T

    def body(i, _):
        base = i * rpi
        for r in range(rpi):
            out_ref[pl.ds(base + r, 1), :] = src_ref[
                pl.ds(idx_ref[base0 + base + r], 1), :
            ]
        return 0

    jax.lax.fori_loop(0, T // rpi, body, 0)


def _loop_gather_kernel_bg(idx_ref, src_ref, out_ref, *, T: int, rpi: int):
    b = pl.program_id(0)
    base0 = pl.program_id(1) * T

    def body(i, _):
        base = i * rpi
        for r in range(rpi):
            out_ref[0, pl.ds(base + r, 1), :] = src_ref[
                0, pl.ds(idx_ref[b, base0 + base + r], 1), :
            ]
        return 0

    jax.lax.fori_loop(0, T // rpi, body, 0)


def loop_gather_eligible(points, n_rows: int) -> bool:
    """True when the loop-gather kernel beats the XLA row gather: TPU backend,
    4-byte dtype (dynamic sublane slices on packed 2-byte slabs are not worth
    it), slab resident in VMEM, enough rows to amortize the kernel launch."""
    B, N, W = points.shape
    return (
        jax.default_backend() == "tpu"
        and points.dtype.itemsize == 4
        and N * W * 4 <= LOOP_GATHER_MAX_SLAB_BYTES
        and n_rows >= 512
    )


def loop_gather_rows(points, flat_idx):
    """Exact row gather ``[B, N, W] x [B, E] -> [B, E, W]``; the source slab
    rides in VMEM and a fori_loop of dynamic sublane slices walks the edges
    (~3.4 ns/row vs XLA's ~6-17, scripts/gather_microbench.py). Indices must
    be in-bounds (promise_in_bounds semantics, like the XLA path)."""
    B, N, W = points.shape
    E = flat_idx.shape[1]
    rpi = _LG_ROWS_PER_ITER
    T = min(2048, _round_up(E, rpi))
    Ep = _round_up(E, T)
    ix = flat_idx.astype(jnp.int32)
    if Ep != E:
        ix = jnp.pad(ix, ((0, 0), (0, Ep - E)))

    if B * Ep * 4 <= BATCHGRID_MAX_PREFETCH_BYTES:
        # One launch, batch folded into the grid; the [N, W] slab block is
        # fetched once per batch element (index map depends only on b).
        out = pl.pallas_call(
            functools.partial(_loop_gather_kernel_bg, T=T, rpi=rpi),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, Ep // T),
                in_specs=[pl.BlockSpec((1, N, W), lambda b, i, idx_ref: (b, 0, 0))],
                out_specs=pl.BlockSpec((1, T, W), lambda b, i, idx_ref: (b, i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((B, Ep, W), points.dtype),
        )(ix, points)
        return out[:, :E] if Ep != E else out

    def one(src_b, idx_b):
        return pl.pallas_call(
            functools.partial(_loop_gather_kernel, T=T, rpi=rpi),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Ep // T,),
                in_specs=[pl.BlockSpec((N, W), lambda i, idx_ref: (0, 0))],
                out_specs=pl.BlockSpec((T, W), lambda i, idx_ref: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((Ep, W), src_b.dtype),
        )(idx_b, src_b)

    out = jax.vmap(one)(points, ix)
    return out[:, :E] if Ep != E else out


def fast_gather_rows(points, flat_idx):
    """Dispatch: loop-gather when eligible, XLA row gather otherwise.
    ``points [B, N, W]``, ``flat_idx [B, E]`` -> ``[B, E, W]``."""
    if loop_gather_eligible(points, flat_idx.shape[1]):
        return loop_gather_rows(points, flat_idx)
    return jnp.take_along_axis(
        points, flat_idx[..., None], axis=1, mode="promise_in_bounds"
    )


# ---------------------------------------------------------------------------
# RMW scatter-add: VMEM-resident [N, W] accumulator, exact f32 adds.
# ---------------------------------------------------------------------------

# Below this destination size the one-hot MXU scatter is faster (its FLOPs
# scale with N); at/above it the RMW loop wins (measured crossover between
# N=2048 and 4096, scripts/scatter_microbench.py).
RMW_SCATTER_MIN_N = 4096
RMW_SCATTER_MAX_SLAB_BYTES = 8 * 1024 * 1024
_RMW_ROWS_PER_ITER = 8


def _rmw_scatter_kernel(idx_ref, g_ref, out_ref, *, T: int, rpi: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base0 = pl.program_id(0) * T

    def body(i, _):
        base = i * rpi
        for r in range(rpi):
            t = idx_ref[base0 + base + r]
            out_ref[pl.ds(t, 1), :] += g_ref[pl.ds(base + r, 1), :]
        return 0

    jax.lax.fori_loop(0, T // rpi, body, 0)


def rmw_scatter_eligible(num_points: int, width: int, n_rows: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and num_points >= RMW_SCATTER_MIN_N
        and num_points * width * 4 <= RMW_SCATTER_MAX_SLAB_BYTES
        and n_rows >= 512
    )


def scatter_add_rmw(grads, idx, num_points: int):
    """sum-scatter ``out[b, idx[b, e]] += grads[b, e]`` via a sequential
    read-modify-write loop over a VMEM-resident ``[num_points, W]`` f32
    accumulator. Exact (no mask-matmul rounding); wins over the one-hot
    scatter once its E*N*W FLOPs dominate (N >= RMW_SCATTER_MIN_N).
    grads ``[B, E, W]``, idx ``[B, E]`` -> ``[B, num_points, W]``.
    Out-of-range targets (padding sentinels) are DROPPED via a clamp+mask:
    the row is redirected to slot 0 with a zeroed contribution."""
    B, E, W = grads.shape
    rpi = _RMW_ROWS_PER_ITER
    T = min(2048, _round_up(E, rpi))
    Ep = _round_up(E, T)
    g = grads.astype(jnp.float32)
    ix = idx.astype(jnp.int32)
    if Ep != E:
        g = jnp.pad(g, ((0, 0), (0, Ep - E), (0, 0)))
        ix = jnp.pad(ix, ((0, 0), (0, Ep - E)), constant_values=num_points)
    # drop semantics for sentinel/padded targets, branch-free
    oob = (ix < 0) | (ix >= num_points)
    g = jnp.where(oob[..., None], 0.0, g)
    ix = jnp.where(oob, 0, ix)

    def one(g_b, idx_b):
        return pl.pallas_call(
            functools.partial(_rmw_scatter_kernel, T=T, rpi=rpi),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Ep // T,),
                in_specs=[pl.BlockSpec((T, W), lambda i, idx_ref: (i, 0))],
                out_specs=pl.BlockSpec((num_points, W), lambda i, idx_ref: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((num_points, W), jnp.float32),
        )(idx_b, g_b)

    return jax.vmap(one)(g, ix)


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
    out = fast_gather_rows(points, flat)
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
    if rmw_scatter_eligible(n_points, C, flat_idx.shape[1]):
        dp = scatter_add_rmw(flat_g, flat_idx, n_points)
    elif jax.default_backend() == "tpu" and flat_idx.shape[1] * n_points >= 1_000_000:
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
