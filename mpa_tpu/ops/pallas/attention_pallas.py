"""Fused post-gather transition attention (forward + VJP) in Pallas.

The LocalTrans hot path (after the node-level softmax fold, see
nn/local_trans.py) is: gather packed ``[E || V]`` node tensors by the kNN
index, then per edge compute ``attn = E/sum_K(E) - 1`` and
``ctx = max_K(attn * (V + shift))``. Left to XLA this materializes several
``[B, S, K, C]`` edge tensors in HBM per branch per direction (profiled:
~18 ms/step of select/multiply/reduce fusions in the part-seg train step).

Here the gather stays in XLA (TPU row gathers run near their floor), but
everything after it is ONE Pallas kernel forward and ONE backward:
the gathered block is read once per direction, denom/attn/max (and the exact
VJP through them, including XLA's tie-splitting max-gradient convention and
the maximum(denom, eps) gate) happen in VMEM, and only ``[B, S, C]`` contexts
(forward) / the ``[B, S, K, 2C]`` gradient block (backward) touch HBM.
Multiple attention branches that share one kNN index (the xyz + spatial
feature branches of LocalMerge, reference modules/pointnet2_utils.py:460-467)
ride the same kernel call on a channel-packed block.

The public entry ``transition_attention`` takes the NODE tensors and the
index, and owns the whole custom VJP: forward = gather + fused kernel;
backward = fused kernel + Pallas one-hot scatter-add. An XLA fallback
(``use_pallas=False``, automatic off-TPU) computes the identical math in
jnp for CPU tests and parity oracles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpa_tpu.ops.pallas.gather_pallas import scatter_add_pallas

_EPS = 1e-38

# Precision of the backward one-hot scatter ('bf16' = one MXU pass with
# bf16-rounded gradient inputs + f32 accumulation — ~0.4% relative rounding on
# a gradient, far below SGD noise, at half the MXU passes; set to 'hilo' for
# ~fp32-exact gradients).
GRAD_SCATTER_PRECISION = "bf16"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_math(E, V, g=None):
    """Shared fwd/bwd math on one branch. E, V: [..., S, K, C]; g: [..., S, C].
    Returns ctx (fwd) or (dE, dV) (bwd). Matches XLA semantics exactly:
    maximum(denom, eps) gates the denom gradient; max-over-K gradient splits
    equally among ties."""
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


def _fwd_kernel(g_ref, shift_ref, ctx_ref, *, n_branches: int, c: int):
    """g_ref: [1, St, K, nB*2C]; shift_ref: [1, St, nB*C]; ctx: [1, St, nB*C]."""
    G = g_ref[0]  # [St, K, W]
    shift = shift_ref[0]  # [St, nB*C]
    outs = []
    for r in range(n_branches):
        E = G[:, :, 2 * r * c : (2 * r + 1) * c]
        V = G[:, :, (2 * r + 1) * c : (2 * r + 2) * c]
        V = V + jnp.expand_dims(shift[:, r * c : (r + 1) * c], 1)
        outs.append(_attn_math(E, V))
    ctx_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(g_ref, shift_ref, gctx_ref, dg_ref, dshift_ref, *, n_branches: int, c: int):
    G = g_ref[0]
    shift = shift_ref[0]
    gctx = gctx_ref[0]
    douts, dshifts = [], []
    for r in range(n_branches):
        E = G[:, :, 2 * r * c : (2 * r + 1) * c]
        V = G[:, :, (2 * r + 1) * c : (2 * r + 2) * c]
        V = V + jnp.expand_dims(shift[:, r * c : (r + 1) * c], 1)
        dE, dV = _attn_math(E, V, gctx[:, r * c : (r + 1) * c])
        douts += [dE, dV]
        dshifts.append(jnp.sum(dV, axis=-2))
    dg_ref[0] = jnp.concatenate(douts, axis=-1)
    dshift_ref[0] = jnp.concatenate(dshifts, axis=-1)


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
        shifts = jnp.pad(shifts, ((0, 0), (0, Sp - S), (0, 0)))
    kern = functools.partial(_fwd_kernel, n_branches=n_branches, c=c)
    ctx = pl.pallas_call(
        kern,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, St, K, W), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, n_branches * c), G.dtype),
    )(G, shifts)
    return ctx[:, :S]


@functools.partial(jax.jit, static_argnames=("n_branches", "c"))
def _bwd_pallas(G, shifts, gctx, n_branches: int, c: int):
    B, S, K, W = G.shape
    St = _pick_tile(S, K, W)
    Sp = _round_up(S, St)
    if Sp != S:
        G = jnp.pad(G, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        shifts = jnp.pad(shifts, ((0, 0), (0, Sp - S), (0, 0)))
        gctx = jnp.pad(gctx, ((0, 0), (0, Sp - S), (0, 0)))
    kern = functools.partial(_bwd_kernel, n_branches=n_branches, c=c)
    dG, dshift = pl.pallas_call(
        kern,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, St, K, W), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, St, K, W), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, n_branches * c), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, K, W), G.dtype),
            jax.ShapeDtypeStruct((B, Sp, n_branches * c), G.dtype),
        ),
    )(G, shifts, gctx)
    return dG[:, :S], dshift[:, :S]


def _gather(packed, idx):
    B, S, K = idx.shape
    flat = idx.reshape(B, S * K)
    out = jnp.take_along_axis(
        packed, flat[..., None], axis=1, mode="promise_in_bounds"
    )
    return out.reshape(B, S, K, packed.shape[-1])


def _xla_reference(packed, idx, shifts, n_branches: int, c: int):
    """Identical math in plain jnp (CPU path + CI oracle)."""
    G = _gather(packed, idx)
    outs = []
    for r in range(n_branches):
        E = G[..., 2 * r * c : (2 * r + 1) * c]
        V = G[..., (2 * r + 1) * c : (2 * r + 2) * c]
        V = V + shifts[:, :, None, r * c : (r + 1) * c]
        denom = jnp.sum(E, axis=2, keepdims=True)
        attn = E / jnp.maximum(denom, _EPS) - 1.0
        outs.append(jnp.max(attn * V, axis=2))
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_pallas(packed, idx, shifts, n_branches: int, c: int):
    G = _gather(jax.lax.stop_gradient(packed), idx)
    return _fwd_pallas(G, shifts, n_branches, c)


def _attention_fwd(packed, idx, shifts, n_branches: int, c: int):
    G = _gather(packed, idx)
    return _fwd_pallas(G, shifts, n_branches, c), (G, idx, shifts, packed.shape[1])


def _attention_bwd(n_branches: int, c: int, res, g):
    G, idx, shifts, n_points = res
    B, S, K, W = G.shape
    dG, dshift = _bwd_pallas(G, shifts, g, n_branches, c)
    dpacked = scatter_add_pallas(
        dG.reshape(B, S * K, W), idx.reshape(B, S * K), n_points,
        precision=GRAD_SCATTER_PRECISION,
    ).astype(G.dtype)
    return dpacked, None, dshift


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
        (the xyz-mode ``b_v - v(center)`` fold), or None for all-zero.
      n_branches / c: static branch count and per-branch channel width.

    Returns ``[B, S, n_branches*C]`` contexts (branch-concatenated).
    """
    if shifts is None:
        shifts = jnp.zeros(
            (packed.shape[0], idx.shape[1], n_branches * c), packed.dtype
        )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _xla_reference(packed, idx, shifts, n_branches, c)
    return _attention_pallas(packed, idx, shifts, n_branches, c)
