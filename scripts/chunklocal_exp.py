"""Chunk-local (no-cross-window-neighbour) attention experiment.

docs/PERF.md's 16k window_all breakdown ends with one unexplored structural
idea: "further gains at 16k would need a different formulation (e.g.
chunk-local softmax with no cross-window neighbours)". This script measures
that formulation against the shipped banded path (VERDICT r4 item 6).

Key observation: the transition attention's query side is analytically
folded out (nn/local_trans.py module doc) — the per-edge weights are
``E_j / sum_{j' in N(i)} E_j' - 1`` and depend on the query ONLY through its
neighbour set ``N(i)``. If ``N(i)`` is widened from "k nearest in the
Morton window" to "the whole window", every query in a padded chunk shares
one neighbour set, so the context collapses to ONE vector per chunk
(xyz-mode's per-query value shift re-couples it weakly). The kNN search,
the banded one-hot gather, and the backward scatter all disappear; what
remains is an O(N*C) window attention-pool — pure VPU elementwise + reduce.

Measured composites at the 16k semseg scale-0 shape (B=2, S=N=16384, C=64,
K=8, sq=128 -> window=256):
  banded:     windowed kNN -> windowed_transition_attention (the shipped
              window-mode hot path, Pallas)
  chunklocal: window attention-pool (pure XLA, no indices at all)

Both are measured forward-only and forward+backward (grads w.r.t. the
packed node tensor), median of ``--iters`` after warmup. Run on the chip:
  python scripts/chunklocal_exp.py [--B 2] [--N 16384] [--C 64] [--iters 50]

The result (either way) is recorded in docs/PERF.md. Semantics note: the
pool changes the neighbour graph far more than window-kNN does (every query
in a chunk sees the same 256 rows); adopting it would need the same
quality-pair protocol as golden/extended_quality.json's window entries.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mpa_tpu.ops.pallas.window_attention import (
    make_window_spec,
    windowed_knn_with_spec,
    windowed_transition_attention,
)

_EPS = 1e-20


def chunklocal_pool(packed: jnp.ndarray, spec, C: int) -> jnp.ndarray:
    """Window attention-pool: _attn_math semantics with the neighbour set
    widened to each padded chunk's full 2-block window.

    packed ``[B, N, 2C]`` = ``[E || V]`` (LocalTrans.node_pack layout).
    Returns ``[B, S, C]`` context, constant within each padded chunk.
    """
    B, N, W = packed.shape
    nc = spec.n_chunks
    # Per-chunk 2-block windows [B, nc+1, 2bn, W]: block g and g+1 for
    # padded chunk c (g = clamp(c-1, 0, nc-2)) — same receptive field as the
    # banded kernels, built with two strided views instead of an index op.
    blocks = packed.reshape(B, nc, spec.bn, W)
    g = jnp.clip(jnp.arange(nc + 1) - 1, 0, nc - 2)
    winA = jnp.take(blocks, g, axis=1)  # [B, nc+1, bn, W]
    winB = jnp.take(blocks, g + 1, axis=1)
    band = jnp.concatenate([winA, winB], axis=2).astype(jnp.float32)
    E = band[..., :C]  # [B, nc+1, 2bn, C]
    V = band[..., C:]
    denom = jnp.maximum(jnp.sum(E, axis=2, keepdims=True), _EPS)
    ctx = jnp.max((E / denom - 1.0) * V, axis=2)  # [B, nc+1, C]
    # Broadcast each padded chunk's context to its sq original rows: original
    # row s lives in padded chunk (s + pad) // sq.
    owner = (jnp.arange(spec.S) + spec.pad) // spec.sq
    return jnp.take(ctx, owner, axis=1)


def _med_ms(fn, args, iters, reps=5):
    """Median per-call ms over ``reps`` windows of ``iters`` calls, each
    window fenced by a HOST transfer of the fn's scalar output — the axon
    tunnel's block_until_ready returns before device work completes
    (bench.py:17-19), so timed fns must return a jnp scalar."""
    float(fn(*args))  # compile + warm + drain
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out)  # true fence
        ts.append((time.perf_counter() - t) / iters * 1e3)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2)
    ap.add_argument("--N", type=int, default=16384)
    ap.add_argument("--C", type=int, default=64)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    B, N, C, K = args.B, args.N, args.C, args.K
    spec = make_window_spec(N, N)
    print(f"B={B} S=N={N} C={C} K={K} sq={spec.sq} window={spec.window} "
          f"backend={jax.default_backend()}")

    r = jax.random.PRNGKey(0)
    xyz = jax.random.normal(r, (B, N, 3), jnp.float32)
    packed = jax.random.normal(jax.random.fold_in(r, 1), (B, N, 2 * C),
                               jnp.float32) * 0.1
    packed = packed.at[..., :C].set(jnp.exp(packed[..., :C]))  # E > 0

    # --- shipped banded path: windowed kNN + banded fused attention ---
    # Timed fns return a jnp SCALAR so the host fence is one float fetch.
    @jax.jit
    def banded_fwd(xyz, packed):
        _, idx, sp = windowed_knn_with_spec(K, xyz, xyz)
        return jnp.sum(windowed_transition_attention(packed, idx, None, 1, C, sp))

    @jax.jit
    def banded_fwdbwd(xyz, packed):
        _, idx, sp = windowed_knn_with_spec(K, xyz, xyz)

        def f(p):
            return jnp.sum(
                windowed_transition_attention(p, idx, None, 1, C, sp) ** 2
            )

        loss, g = jax.value_and_grad(f)(packed)
        return loss + jnp.sum(g[0, 0])

    # --- chunk-local pool: no indices at all ---
    @jax.jit
    def pool_fwd(packed):
        return jnp.sum(chunklocal_pool(packed, spec, C))

    @jax.jit
    def pool_fwdbwd(packed):
        def f(p):
            return jnp.sum(chunklocal_pool(p, spec, C) ** 2)

        loss, g = jax.value_and_grad(f)(packed)
        return loss + jnp.sum(g[0, 0])

    # Shape sanity (un-timed).
    assert chunklocal_pool(packed, spec, C).shape == (B, N, C)

    res = {}
    res["banded_fwd"] = _med_ms(banded_fwd, (xyz, packed), args.iters)
    res["banded_fwdbwd"] = _med_ms(banded_fwdbwd, (xyz, packed), args.iters)
    res["chunklocal_fwd"] = _med_ms(pool_fwd, (packed,), args.iters)
    res["chunklocal_fwdbwd"] = _med_ms(pool_fwdbwd, (packed,), args.iters)

    for k, v in res.items():
        print(f"{k:>18s}: {v:7.3f} ms")
    print(f"fwd speedup  : {res['banded_fwd'] / res['chunklocal_fwd']:.2f}x")
    print(f"fwdbwd speedup: {res['banded_fwdbwd'] / res['chunklocal_fwdbwd']:.2f}x")


if __name__ == "__main__":
    main()
