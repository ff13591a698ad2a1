"""Microbenchmark: arbitrary row gather [B, N, W] x idx [B, E] -> [B, E, W].

The part-seg exact path spends ~6.8 ms/step (B8) in XLA row gathers at a
measured ~8 ns/row (docs/PERF.md). This probes whether a Pallas kernel that
keeps the node slab in VMEM and walks edges with dynamic sublane slices can
beat that row rate at the model's mid sizes (512 < N <= 4096, W 64-256), i.e.
whether the "two-level gather" attack from VERDICT r2 item 4 has headroom.

Variants:
  xla     jnp.take_along_axis (the production large-N path)
  onehot  one-hot bf16-hilo3 mask matmul (the production small-N path,
          E*N*W MXU FLOPs)
  loop    Pallas: slab resident in VMEM, fori_loop of dynamic row
          reads/writes (idx in SMEM via PrefetchScalarGridSpec)
  loop8   same but 8 rows (one K-group) per iteration

Usage: python scripts/gather_microbench.py [--sizes small|model]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_xla(slab, idx):
    return jnp.take_along_axis(slab, idx[..., None], axis=1)


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def gather_onehot(slab, idx):
    B, N, W = slab.shape
    E = idx.shape[1]
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (B, E, N), 2)
    mask = (idx[:, :, None] == n_ids).astype(jnp.bfloat16)
    out = None
    for part in _split3(slab):
        t = jnp.einsum("ben,bnw->bew", mask, part,
                       preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _loop_kernel(idx_ref, slab_ref, out_ref, *, T: int, rows_per_iter: int):
    base0 = pl.program_id(0) * T

    def body(i, _):
        base = i * rows_per_iter
        for r in range(rows_per_iter):
            row = slab_ref[pl.ds(idx_ref[base0 + base + r], 1), :]
            out_ref[pl.ds(base + r, 1), :] = row
        return 0

    jax.lax.fori_loop(0, T // rows_per_iter, body, 0)


@functools.partial(jax.jit, static_argnames=("rows_per_iter", "T"))
def gather_loop(slab, idx, rows_per_iter: int = 1, T: int = 1024):
    B, N, W = slab.shape
    E = idx.shape[1]
    assert E % T == 0

    def one(slab_b, idx_b):
        return pl.pallas_call(
            functools.partial(_loop_kernel, T=T, rows_per_iter=rows_per_iter),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(E // T,),
                in_specs=[pl.BlockSpec((N, W), lambda i, idx_ref: (0, 0))],
                out_specs=pl.BlockSpec((T, W), lambda i, idx_ref: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((E, W), slab.dtype),
        )(idx_b, slab_b)

    return jax.vmap(one)(slab, idx)


REPS = 32  # in-jit repetitions: one dispatch, R gathers (dispatch on this
# tunneled 1-core host costs ~1-3 ms — more than the gathers themselves)


def bench(fn, slab, idx, iters=8):
    N = slab.shape[1]

    @jax.jit
    def many(slab, idx):
        def body(i, acc):
            # cheap per-rep idx perturbation: defeats CSE without changing
            # the access pattern's statistics
            out = fn(slab, (idx + i) % N)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(many(slab, idx))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = many(slab, idx)
    float(acc)
    dt = (time.perf_counter() - t0) / iters / REPS
    rows = idx.shape[0] * idx.shape[1]
    return dt, dt / rows * 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="model")
    args = ap.parse_args()

    if args.sizes == "model":
        # (B, N, W, E): the part-seg exact path's gather shapes
        cases = [
            (8, 2048, 128, 16384),
            (8, 1024, 128, 8192),
            (8, 1024, 256, 8192),
            (8, 4096, 128, 32768),
        ]
    else:
        cases = [(2, 1024, 128, 8192)]

    r = np.random.default_rng(0)
    for B, N, W, E in cases:
        slab = jnp.asarray(r.normal(size=(B, N, W)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, E)).astype(np.int32))
        print(f"B{B} N{N} W{W} E{E}:", flush=True)
        for name, fn in [
            ("xla", jax.jit(gather_xla)),
            ("onehot", jax.jit(gather_onehot)),
            ("loop", functools.partial(gather_loop, rows_per_iter=1)),
            ("loop8", functools.partial(gather_loop, rows_per_iter=8)),
        ]:
            try:
                ref = gather_xla(slab, idx)
                out = fn(slab, idx)
                ok = bool(jnp.allclose(out, ref, atol=0, rtol=0))
                dt, ns = bench(fn, slab, idx)
                print(f"  {name:7s} {dt*1e3:8.3f} ms  {ns:6.2f} ns/row  exact={ok}",
                      flush=True)
            except Exception as e:
                print(f"  {name:7s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
