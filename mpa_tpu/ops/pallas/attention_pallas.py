"""Fused post-gather transition attention (forward + VJP) in Pallas.

The LocalTrans hot path (after the node-level softmax fold, see
nn/local_trans.py) is: gather packed ``[E || V]`` node tensors by the kNN
index, then per edge compute ``attn = E/sum_K(E) - 1`` and
``ctx = max_K(attn * (V + shift))``. Left to XLA this materializes several
``[B, S, K, C]`` edge tensors in HBM per branch per direction (profiled:
~18 ms/step of select/multiply/reduce fusions in the part-seg train step).

Two fused paths, chosen per node-array size (measured crossover on v5e):

- **Large N (> SMALL_N_THRESHOLD)**: the gather stays in XLA (TPU row
  gathers run near their floor at these sizes), then ONE Pallas kernel
  forward and ONE backward. The backward recomputes the per-edge gradients
  in VMEM and immediately accumulates them into the node accumulator as a
  one-hot MXU matmul, so the ``[B, S, K, W]`` edge-GRADIENT tensor never
  exists in HBM (the gathered forward block is the VJP residual).
- **Small N (<= SMALL_N_THRESHOLD)**: fully fused — the ``[N, W]`` packed
  slab rides in VMEM and the gather itself happens in-kernel as a one-hot
  matmul with an exact 3-way bf16 split (``_split3``: bit-identical to an
  f32 row gather), so NO edge tensor exists in HBM in either direction and
  the VJP residual is just the node array.

Both paths share the attention math (``_attn_math``): denom/attn/max and
the exact VJP through them, including XLA's tie-splitting max-gradient
convention and the maximum(denom, eps) gate, all in VMEM. Multiple
attention branches that share one kNN index (the xyz + spatial feature
branches of LocalMerge, reference modules/pointnet2_utils.py:460-467) ride
the same kernel call on a channel-packed block; a None ``shifts`` drops
that operand entirely (no zeros tensor, no per-edge add).

The public entry ``transition_attention`` takes the NODE tensors and the
index and owns the whole custom VJP. An XLA fallback (``use_pallas=False``,
automatic off-TPU) computes the identical math in jnp for CPU tests and
parity oracles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpa_tpu.ops.pallas.gather_pallas import scatter_add_pallas

# Guard for an all-underflowed exp-sum denominator. Must sit ABOVE the f32
# subnormal range: 1e-38 flushes to 0.0 on TPU/CPU, turning the guard into
# 0/0 = NaN on zero rows (S-padding in the fused backward, or a query whose
# K neighbours all underflow vs the node-level stabilizer max).
_EPS = 1e-20

# Precision of the backward one-hot scatter ('bf16' = one MXU pass with
# bf16-rounded gradient inputs + f32 accumulation — ~0.4% relative rounding on
# a gradient, far below SGD noise, at half the MXU passes; set to 'hilo' for
# ~fp32-exact gradients).
GRAD_SCATTER_PRECISION = "bf16"

# In-kernel one-hot gather precision on the small-N path: 'hilo3' is an
# exact 3-way bf16 split (bit-identical to an f32 row gather, see _split3);
# 'bf16' is one MXU pass with the gathered VALUES rounded to bf16.
GATHER_PRECISION = "hilo3"

# Node arrays at or below this size take the fully fused small-N path: the
# [N, W] packed slab rides in VMEM and the gather happens IN-KERNEL as an
# exact 3-way bf16-split one-hot matmul, so the [B, S, K, W] edge tensor
# never exists in HBM in either direction. Above it, the XLA row gather is
# cheaper than the one-hot's E*N*W MXU cost (measured crossover on v5e
# between N=512 and N=1024 at the model's widths).
SMALL_N_THRESHOLD = 512

# Above this node-array size the backward leaves the fused one-hot kernel:
# its scatter costs E*Npad*W MXU FLOPs — quadratic in scene size at
# self-scale transitions — while XLA's native scatter-add is row-rate-bound.
# Measured on v5e at the model's widths (B=2, K=8, W=128, S=N/2): one-hot vs
# XLA is 3.4/3.8 ms at N=2048, 4.2/4.1 at 4096, 4.2/3.9 at 8192, OOM/5.4 at
# 16384 (the [K, Npad] mask row + [Npad, W] accumulator exceed scoped VMEM).
# The per-edge gradients are then computed in plain XLA via the same
# _attn_math (f32-exact, no bf16 scatter rounding) with the edge-gradient
# tensor materialized in HBM — the one-hot kernel's HBM saving no longer
# pays for its FLOPs at these sizes.
LARGE_N_SCATTER_THRESHOLD = 4096


def _split3(x):
    """Exact 3-way bf16 split of f32 ``x``: hi + mid + lo == x bit-for-bit
    (24 mantissa bits in 3x8; exact barring subnormal underflow). Each part
    multiplies an exact 0/1 bf16 mask on the MXU with f32 accumulation, so a
    3-pass one-hot matmul reproduces an f32 gather exactly."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_mask(idx, n, out_dtype):
    """idx [St, K] int32 -> one-hot mask [St*K, n] in edge (s, k) row order.

    Built as K per-lane-slice compares stacked on a MAJOR axis: the idx
    operand keeps its natural [B, S, K] layout (a [B, S*K, 1] operand has a
    1-wide minor dim, which costs a 128x-padded relayout copy per call), and
    the (St, K, n) -> (St*K, n) reshape merges major dims, free in Mosaic."""
    St, K = idx.shape
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (St, K, n), 2)
    mask = (idx[:, :, None] == n_ids).astype(out_dtype)
    return mask.reshape(St * K, n)


def _mask_gather(mask_bf16, slab, precision):
    """Gather slab rows through a one-hot mask: [R, N] @ [N, W] -> [R, W] f32.
    'hilo3' = exact f32; 'bf16' = values rounded to bf16 (one pass)."""
    dn = (((1,), (0,)), ((), ()))
    if precision == "bf16":
        return jax.lax.dot_general(
            mask_bf16, slab.astype(jnp.bfloat16),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    out = None
    for part in _split3(slab):
        t = jax.lax.dot_general(
            mask_bf16, part, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        out = t if out is None else out + t
    return out


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_math(E, V, g=None):
    """Shared fwd/bwd math on one branch. E, V: [..., S, K, C]; g: [..., S, C].
    Returns ctx (fwd) or (dE, dV) (bwd). Matches XLA semantics exactly:
    maximum(denom, eps) gates the denom gradient; max-over-K gradient splits
    equally among ties. Inputs must be f32: _EPS underflows in bf16 (same
    exponent range as f32, but the denom sum itself loses bits) — callers
    upcast per-tile in VMEM so HBM traffic stays in the storage dtype."""
    denom = jnp.sum(E, axis=-2, keepdims=True)
    denom_f = jnp.maximum(denom, _EPS)
    attn = E / denom_f - 1.0
    w = attn * V
    m = jnp.max(w, axis=-2, keepdims=True)
    if g is None:
        return jnp.squeeze(m, axis=-2)
    eq = (w == m).astype(E.dtype)
    cnt = jnp.sum(eq, axis=-2, keepdims=True)
    dw = eq / cnt * g[..., None, :]
    dV = dw * attn
    dattn = dw * V
    t = jnp.sum(dattn * E, axis=-2, keepdims=True)
    # where (select), not multiply: when the eps floor engages, t/denom^2 can
    # be inf and 0*inf would poison the gradient with NaNs.
    corr = jnp.where(denom >= _EPS, t / (denom_f * denom_f), jnp.zeros_like(t))
    dE = dattn / denom_f - corr
    return dE, dV


def _fwd_kernel(g_ref, *rest, n_branches: int, c: int, has_shift: bool):
    """g_ref: [1, St, K, nB*2C]; shift_ref (if has_shift): [1, St, nB*C];
    ctx: [1, St, nB*C]. A None shift drops the operand entirely (no zeros
    tensor in HBM, no per-edge add — the common single-branch feature-mode
    call). Math runs in f32 (see _attn_math); bf16 inputs upcast per-tile.
    The expand_dims reshape must happen on an f32 vector — Mosaic's layout
    inference rejects the (St, c) -> (St, 1, c) shape cast on bf16."""
    if has_shift:
        shift_ref, ctx_ref = rest
        shift = shift_ref[0]  # [St, nB*C]
    else:
        (ctx_ref,) = rest
    G = g_ref[0].astype(jnp.float32)  # [St, K, W]
    outs = []
    for r in range(n_branches):
        E = G[:, :, 2 * r * c : (2 * r + 1) * c]
        V = G[:, :, (2 * r + 1) * c : (2 * r + 2) * c]
        if has_shift:
            s = shift[:, r * c : (r + 1) * c].astype(jnp.float32)
            V = V + jnp.expand_dims(s, 1)
        outs.append(_attn_math(E, V))
    ctx_ref[0] = jnp.concatenate(outs, axis=-1).astype(ctx_ref.dtype)


def _bwd_scatter_kernel(
    g_ref, *rest, n_branches: int, c: int, precision: str, has_shift: bool,
):
    """Fused attention-backward + one-hot scatter-add.

    Per (batch, S-chunk) grid step: recompute the per-edge gradients dG in
    VMEM exactly as _bwd_kernel, then immediately accumulate
    ``dpacked[n] += sum_{(s,k): idx[s,k]==n} dG[s,k]`` as a one-hot matmul on
    the MXU. The [B, S, K, W] edge-gradient tensor never exists in HBM (the
    old path wrote it out and re-read it in scatter_add_pallas — two extra
    full passes over the largest tensor in the step).

    g_ref: [1, St, K, W]; shift (if has_shift)/gctx: [1, St, nB*C];
    idx_ref: [1, St, K]; dpacked_ref: [1, Npad, W]
    accumulator, revisited across the minor (S-chunk) grid dim;
    dshift_ref (if has_shift): [1, St, nB*C].
    """
    if has_shift:
        shift_ref, gctx_ref, idx_ref, dpacked_ref, dshift_ref = rest
        shift = shift_ref[0]
    else:
        gctx_ref, idx_ref, dpacked_ref = rest
    _, St, K, W = g_ref.shape
    Npad = dpacked_ref.shape[1]
    s_chunk = pl.program_id(1)

    G = g_ref[0].astype(jnp.float32)
    gctx = gctx_ref[0].astype(jnp.float32)
    douts, dshifts = [], []
    for r in range(n_branches):
        E = G[:, :, 2 * r * c : (2 * r + 1) * c]
        V = G[:, :, (2 * r + 1) * c : (2 * r + 2) * c]
        if has_shift:
            s = shift[:, r * c : (r + 1) * c].astype(jnp.float32)
            V = V + jnp.expand_dims(s, 1)
        dE, dV = _attn_math(E, V, gctx[:, r * c : (r + 1) * c])
        douts += [dE, dV]
        if has_shift:
            dshifts.append(jnp.sum(dV, axis=-2))
    dG = jnp.concatenate(douts, axis=-1).reshape(St * K, W)
    if has_shift:
        dshift_ref[0] = jnp.concatenate(dshifts, axis=-1).astype(dshift_ref.dtype)

    @pl.when(s_chunk == 0)
    def _():
        dpacked_ref[0] = jnp.zeros((Npad, W), jnp.float32)

    dn = (((0,), (0,)), ((), ()))
    if precision == "bf16":
        mask = _onehot_mask(idx_ref[0], Npad, jnp.bfloat16)  # [St*K, Npad]
        acc = jax.lax.dot_general(
            mask, dG.astype(jnp.bfloat16),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    else:
        mask = _onehot_mask(idx_ref[0], Npad, jnp.float32)
        hi = dG.astype(jnp.bfloat16).astype(jnp.float32)
        acc = jax.lax.dot_general(
            mask, hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            mask, dG - hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
    dpacked_ref[0] += acc


def _fused_small_fwd_kernel(
    packed_ref, idx_ref, *rest, n_branches: int, c: int, has_shift: bool,
    gather_precision: str,
):
    """Small-N fused forward: packed_ref [1, Npad, W] whole slab;
    idx_ref [1, St, K] (local == global); ctx [1, St, nB*C]."""
    if has_shift:
        shift_ref, ctx_ref = rest
        shift = shift_ref[0]
    else:
        (ctx_ref,) = rest
    _, Npad, W = packed_ref.shape
    St, K = idx_ref.shape[1], idx_ref.shape[2]
    slab = packed_ref[0].astype(jnp.float32)
    mask = _onehot_mask(idx_ref[0], Npad, jnp.bfloat16)  # [St*K, Npad]
    G = _mask_gather(mask, slab, gather_precision).reshape(St, K, W)
    outs = []
    for r in range(n_branches):
        E = G[:, :, 2 * r * c : (2 * r + 1) * c]
        V = G[:, :, (2 * r + 1) * c : (2 * r + 2) * c]
        if has_shift:
            s = shift[:, r * c : (r + 1) * c].astype(jnp.float32)
            V = V + jnp.expand_dims(s, 1)
        outs.append(_attn_math(E, V))
    ctx_ref[0] = jnp.concatenate(outs, axis=-1).astype(ctx_ref.dtype)


def _fused_small_bwd_kernel(
    packed_ref, idx_ref, *rest, n_branches: int, c: int, has_shift: bool,
    gather_precision: str, scatter_precision: str,
):
    """Small-N fused backward: recompute the in-VMEM gather + attention
    gradients, then scatter dG into the [Npad, W] accumulator through the
    SAME one-hot mask transposed. The edge tensor exists only in VMEM."""
    if has_shift:
        shift_ref, gctx_ref, dpacked_ref, dshift_ref = rest
        shift = shift_ref[0]
    else:
        gctx_ref, dpacked_ref = rest
    _, Npad, W = packed_ref.shape
    St, K = idx_ref.shape[1], idx_ref.shape[2]
    s_chunk = pl.program_id(1)

    slab = packed_ref[0].astype(jnp.float32)
    mask = _onehot_mask(idx_ref[0], Npad, jnp.bfloat16)
    G = _mask_gather(mask, slab, gather_precision).reshape(St, K, W)
    gctx = gctx_ref[0].astype(jnp.float32)
    douts, dshifts = [], []
    for r in range(n_branches):
        E = G[:, :, 2 * r * c : (2 * r + 1) * c]
        V = G[:, :, (2 * r + 1) * c : (2 * r + 2) * c]
        if has_shift:
            s = shift[:, r * c : (r + 1) * c].astype(jnp.float32)
            V = V + jnp.expand_dims(s, 1)
        dE, dV = _attn_math(E, V, gctx[:, r * c : (r + 1) * c])
        douts += [dE, dV]
        if has_shift:
            dshifts.append(jnp.sum(dV, axis=-2))
    dG = jnp.concatenate(douts, axis=-1).reshape(St * K, W)
    if has_shift:
        dshift_ref[0] = jnp.concatenate(dshifts, axis=-1).astype(dshift_ref.dtype)

    @pl.when(s_chunk == 0)
    def _():
        dpacked_ref[0] = jnp.zeros((Npad, W), jnp.float32)

    dn = (((0,), (0,)), ((), ()))
    if scatter_precision == "bf16":
        acc = jax.lax.dot_general(
            mask, dG.astype(jnp.bfloat16),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    else:
        hi = dG.astype(jnp.bfloat16).astype(jnp.float32)
        acc = jax.lax.dot_general(
            mask, hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            mask, dG - hi, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
    dpacked_ref[0] += acc


def _pick_small_tile(N: int, K: int, W: int) -> int:
    # live per-row: the [K, Npad] bf16 mask row + ~8 [K, W] f32 temporaries;
    # fixed: the f32 slab + its 3 bf16 splits + the [Npad, W] accumulator.
    fixed = N * W * (4 + 3 * 2 + 4)
    budget = 10 * 1024 * 1024 - fixed
    per_row = K * (N * 2 + W * 4 * 8)
    st = max(8, min(512, budget // per_row // 8 * 8))
    return st


@functools.partial(
    jax.jit, static_argnames=("n_branches", "c", "gather_precision")
)
def _fused_small_fwd(
    packed, idx, shifts, n_branches: int, c: int, gather_precision: str
):
    B, N, W = packed.shape
    S, K = idx.shape[1], idx.shape[2]
    Npad = _round_up(N, 128)
    if Npad != N:
        packed = jnp.pad(packed, ((0, 0), (0, Npad - N), (0, 0)))
    St = min(_pick_small_tile(Npad, K, W), _round_up(S, 8))
    Sp = _round_up(S, St)
    has_shift = shifts is not None
    if Sp != S:
        idx = jnp.pad(idx, ((0, 0), (0, Sp - S), (0, 0)))
        if has_shift:
            shifts = jnp.pad(shifts, ((0, 0), (0, Sp - S), (0, 0)))
    idx_i32 = idx.astype(jnp.int32)
    kern = functools.partial(
        _fused_small_fwd_kernel, n_branches=n_branches, c=c,
        has_shift=has_shift, gather_precision=gather_precision,
    )
    vec_spec = pl.BlockSpec(
        (1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
    )
    ctx = pl.pallas_call(
        kern,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, Npad, W), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, K), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ]
        + ([vec_spec] if has_shift else []),
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct((B, Sp, n_branches * c), packed.dtype),
    )(packed, idx_i32, *((shifts,) if has_shift else ()))
    return ctx[:, :S]


@functools.partial(
    jax.jit,
    static_argnames=("n_branches", "c", "gather_precision", "scatter_precision"),
)
def _fused_small_bwd(
    packed, idx, shifts, gctx, n_branches: int, c: int,
    gather_precision: str, scatter_precision: str,
):
    B, N, W = packed.shape
    S, K = idx.shape[1], idx.shape[2]
    Npad = _round_up(N, 128)
    if Npad != N:
        packed = jnp.pad(packed, ((0, 0), (0, Npad - N), (0, 0)))
    St = min(_pick_small_tile(Npad, K, W), _round_up(S, 8))
    Sp = _round_up(S, St)
    has_shift = shifts is not None
    if Sp != S:
        # padded rows must gather real rows (any) but contribute nothing:
        # their gctx is zero, so dG rows are zero and the scatter adds zero.
        idx = jnp.pad(idx, ((0, 0), (0, Sp - S), (0, 0)))
        gctx = jnp.pad(gctx, ((0, 0), (0, Sp - S), (0, 0)))
        if has_shift:
            shifts = jnp.pad(shifts, ((0, 0), (0, Sp - S), (0, 0)))
    idx_i32 = idx.astype(jnp.int32)
    kern = functools.partial(
        _fused_small_bwd_kernel, n_branches=n_branches, c=c,
        has_shift=has_shift, gather_precision=gather_precision,
        scatter_precision=scatter_precision,
    )
    vec_spec = pl.BlockSpec(
        (1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, Npad, W), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, K), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ]
        + ([vec_spec] if has_shift else [])
        + [vec_spec],
        out_specs=(
            pl.BlockSpec((1, Npad, W), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        )
        + ((vec_spec,) if has_shift else ()),
        out_shape=(jax.ShapeDtypeStruct((B, Npad, W), jnp.float32),)
        + (
            (jax.ShapeDtypeStruct((B, Sp, n_branches * c), packed.dtype),)
            if has_shift
            else ()
        ),
    )(packed, idx_i32, *((shifts,) if has_shift else ()), gctx)
    if has_shift:
        dpacked, dshift = outs
        return dpacked[:, :N], dshift[:, :S]
    (dpacked,) = outs
    return dpacked[:, :N], None


def _pick_tile(S: int, K: int, W: int) -> int:
    # The bwd kernel keeps ~10 [St, K, C]-sized live values plus the in/out
    # blocks; a ~1MB [St, K, W] tile stays well inside the 16MB scoped VMEM.
    budget = 1024 * 1024
    st = max(8, min(1024, budget // (K * W * 4) // 8 * 8))
    return min(st, _round_up(S, 8))


@functools.partial(jax.jit, static_argnames=("n_branches", "c"))
def _fwd_pallas(G, shifts, n_branches: int, c: int):
    B, S, K, W = G.shape
    St = _pick_tile(S, K, W)
    Sp = _round_up(S, St)
    if Sp != S:
        G = jnp.pad(G, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        if shifts is not None:
            shifts = jnp.pad(shifts, ((0, 0), (0, Sp - S), (0, 0)))
    has_shift = shifts is not None
    kern = functools.partial(
        _fwd_kernel, n_branches=n_branches, c=c, has_shift=has_shift
    )
    shift_spec = pl.BlockSpec(
        (1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
    )
    ctx = pl.pallas_call(
        kern,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, St, K, W), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
        ] + ([shift_spec] if has_shift else []),
        out_specs=pl.BlockSpec((1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, n_branches * c), G.dtype),
    )(G, *((shifts,) if has_shift else ()))
    return ctx[:, :S]


@functools.partial(
    jax.jit,
    static_argnames=("n_points", "n_branches", "c", "scatter_precision"),
)
def _bwd_scatter_pallas(
    G, shifts, gctx, idx, n_points: int, n_branches: int, c: int,
    scatter_precision: str,
):
    """Fused backward: (dpacked [B, n_points, W] f32, dshift [B, S, nB*C])."""
    B, S, K, W = G.shape
    Npad = _round_up(n_points, 128)
    # VMEM model per S-row: ~8 live [K, W] f32 temporaries through the
    # attention backward (G, V, dw/dV/dattn/dE chains, dG) plus the
    # [K, Npad] mask row; fixed: the [Npad, W] f32 accumulator. Budget well
    # under the 16MB scoped limit (double-buffered input blocks ride on top).
    bytes_per = 2 if scatter_precision == "bf16" else 4
    budget = 10 * 1024 * 1024 - Npad * W * 4
    per_row = K * (W * 4 * 8 + Npad * bytes_per)
    bound = max(8, min(512, budget // per_row))
    # Largest power of two <= bound: S is a power of two at every model scale,
    # so Sp == S and the [B, S, K, W] operand needs no HBM pad pass (a pad on
    # the step's largest tensor costs ~3.5 ms, more than the fusion saves).
    St = 1 << (bound.bit_length() - 1)
    St = min(St, _round_up(S, 8))
    Sp = _round_up(S, St)
    has_shift = shifts is not None
    if Sp != S:
        G = jnp.pad(G, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        if has_shift:
            shifts = jnp.pad(shifts, ((0, 0), (0, Sp - S), (0, 0)))
        gctx = jnp.pad(gctx, ((0, 0), (0, Sp - S), (0, 0)))
        # padded rows must claim no target node
        idx = jnp.pad(idx, ((0, 0), (0, Sp - S), (0, 0)), constant_values=Npad + 1)
    idx_i32 = idx.astype(jnp.int32)
    kern = functools.partial(
        _bwd_scatter_kernel, n_branches=n_branches, c=c,
        precision=scatter_precision, has_shift=has_shift,
    )
    vec_spec = pl.BlockSpec(
        (1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, St, K, W), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
        ]
        + ([vec_spec] if has_shift else [])
        + [
            vec_spec,
            pl.BlockSpec((1, St, K), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Npad, W), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        )
        + ((vec_spec,) if has_shift else ()),
        out_shape=(jax.ShapeDtypeStruct((B, Npad, W), jnp.float32),)
        + (
            (jax.ShapeDtypeStruct((B, Sp, n_branches * c), G.dtype),)
            if has_shift
            else ()
        ),
    )(G, *((shifts,) if has_shift else ()), gctx, idx_i32)
    if has_shift:
        dpacked, dshift = outs
        return dpacked[:, :n_points], dshift[:, :S]
    (dpacked,) = outs
    return dpacked[:, :n_points], None


@functools.partial(jax.jit, static_argnames=("n_points", "n_branches", "c"))
def _bwd_scatter_xla(G, shifts, gctx, idx, n_points: int, n_branches: int, c: int):
    """Large-N backward: same per-edge gradient math as _bwd_scatter_kernel
    (shared _attn_math), but the scatter-add runs as XLA's native
    row-rate-bound scatter instead of the one-hot MXU matmul (see
    LARGE_N_SCATTER_THRESHOLD). f32 throughout — exact, no bf16 rounding."""
    B, S, K, W = G.shape
    Gf = G.astype(jnp.float32)
    g = gctx.astype(jnp.float32)
    douts, dshifts = [], []
    for r in range(n_branches):
        E = Gf[..., 2 * r * c : (2 * r + 1) * c]
        V = Gf[..., (2 * r + 1) * c : (2 * r + 2) * c]
        if shifts is not None:
            V = V + shifts[:, :, None, r * c : (r + 1) * c].astype(jnp.float32)
        dE, dV = _attn_math(E, V, g[..., r * c : (r + 1) * c])
        douts += [dE, dV]
        if shifts is not None:
            dshifts.append(jnp.sum(dV, axis=2))
    dG = jnp.concatenate(douts, axis=-1).reshape(B, S * K, W)
    flat_idx = idx.astype(jnp.int32).reshape(B, S * K)
    from mpa_tpu.ops.pallas.gather_pallas import (
        rmw_scatter_eligible, scatter_add_rmw,
    )

    if rmw_scatter_eligible(n_points, W, S * K):
        # VMEM RMW accumulator: 7.5 vs 32 ns/row over XLA's native scatter at
        # N=4096 (scripts/scatter_microbench.py); exact f32 adds, drop
        # semantics for the padded sentinel targets.
        dpacked = scatter_add_rmw(dG, flat_idx, n_points)
    else:
        dpacked = (
            jnp.zeros((B, n_points, W), jnp.float32)
            .at[jnp.arange(B)[:, None], flat_idx]
            .add(dG, mode="drop", indices_are_sorted=False, unique_indices=False)
        )
    dshift = (
        jnp.concatenate(dshifts, axis=-1).astype(shifts.dtype)
        if shifts is not None
        else None
    )
    return dpacked, dshift


def _gather(packed, idx):
    from mpa_tpu.ops.pallas.gather_pallas import fast_gather_rows

    B, S, K = idx.shape
    flat = idx.reshape(B, S * K)
    out = fast_gather_rows(packed, flat)
    return out.reshape(B, S, K, packed.shape[-1])


def _xla_reference(packed, idx, shifts, n_branches: int, c: int):
    """Identical math in plain jnp (CPU path + CI oracle). Like the kernel,
    internal math runs in f32 (bf16 storage dtypes upcast per-branch).
    Pure-XLA gather on purpose: keeps this path differentiable everywhere
    and independent of the Pallas kernels it serves as the oracle for."""
    B, S, K = idx.shape
    flat = idx.reshape(B, S * K)
    G = jnp.take_along_axis(
        packed, flat[..., None], axis=1, mode="promise_in_bounds"
    ).reshape(B, S, K, packed.shape[-1]).astype(jnp.float32)
    if shifts is not None:
        shifts = shifts.astype(jnp.float32)
    outs = []
    for r in range(n_branches):
        E = G[..., 2 * r * c : (2 * r + 1) * c]
        V = G[..., (2 * r + 1) * c : (2 * r + 2) * c]
        if shifts is not None:
            V = V + shifts[:, :, None, r * c : (r + 1) * c]
        denom = jnp.sum(E, axis=2, keepdims=True)
        attn = E / jnp.maximum(denom, _EPS) - 1.0
        outs.append(jnp.max(attn * V, axis=2))
    return jnp.concatenate(outs, axis=-1).astype(packed.dtype)


def _use_small_path(packed) -> bool:
    return packed.shape[1] <= SMALL_N_THRESHOLD


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_pallas(packed, idx, shifts, n_branches: int, c: int):
    # The module-level precision knobs are read HERE (trace time of the
    # caller) and threaded to the inner jits as static args, so the inner-jit
    # caches key on them and flipping a knob always retraces (advisor r1).
    if _use_small_path(packed):
        return _fused_small_fwd(
            jax.lax.stop_gradient(packed), idx, shifts, n_branches, c,
            gather_precision=GATHER_PRECISION,
        )
    G = _gather(jax.lax.stop_gradient(packed), idx)
    return _fwd_pallas(G, shifts, n_branches, c)


def _attention_fwd(packed, idx, shifts, n_branches: int, c: int):
    if _use_small_path(packed):
        # No edge-tensor residual: the backward re-gathers in VMEM.
        ctx = _fused_small_fwd(
            packed, idx, shifts, n_branches, c,
            gather_precision=GATHER_PRECISION,
        )
        return ctx, (packed, idx, shifts, None)
    G = _gather(packed, idx)
    # n_points rides on packed's static shape; XLA DCEs the values.
    return _fwd_pallas(G, shifts, n_branches, c), (packed, idx, shifts, G)


def _attention_bwd(n_branches: int, c: int, res, g):
    packed, idx, shifts, G = res
    if G is None:
        dpacked, dshift = _fused_small_bwd(
            packed, idx, shifts, g, n_branches, c,
            gather_precision=GATHER_PRECISION,
            scatter_precision=GRAD_SCATTER_PRECISION,
        )
        return dpacked.astype(packed.dtype), None, dshift
    if packed.shape[1] > LARGE_N_SCATTER_THRESHOLD:
        dpacked, dshift = _bwd_scatter_xla(
            G, shifts, g, idx, packed.shape[1], n_branches, c
        )
    else:
        dpacked, dshift = _bwd_scatter_pallas(
            G, shifts, g, idx, packed.shape[1], n_branches, c,
            scatter_precision=GRAD_SCATTER_PRECISION,
        )
    return dpacked.astype(G.dtype), None, dshift


_attention_pallas.defvjp(_attention_fwd, _attention_bwd)


def transition_attention(
    packed: jnp.ndarray,
    idx: jnp.ndarray,
    shifts: Optional[jnp.ndarray],
    n_branches: int,
    c: int,
    *,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused multi-branch transition attention.

    Args:
      packed: ``[B, N, n_branches*2C]`` node tensors, branch r occupying
        channels ``[2rC, 2(r+1)C)`` as ``[E_r || V_r]``. E channels must be
        POSITIVE (they are ``exp(...)`` softmax numerators); the eps floor on
        their K-sum only guards underflow, not sign.
      idx: ``[B, S, K]`` shared neighbour indices into the N axis.
      shifts: ``[B, S, n_branches*C]`` per-query additive value shifts
        (the xyz-mode ``b_v - v(center)`` fold), or None — a None shift is
        dropped from the kernels entirely (no zeros tensor, no per-edge add,
        no dshift output), the common single-branch feature-mode call.
      n_branches / c: static branch count and per-branch channel width.

    Returns ``[B, S, n_branches*C]`` contexts (branch-concatenated).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _xla_reference(packed, idx, shifts, n_branches, c)
    return _attention_pallas(packed, idx, shifts, n_branches, c)
