"""Microbenchmark: scatter-add out[b, idx[b,e]] += g[b,e] — the gather VJP.

Compares the production one-hot MXU scatter (gather_pallas.scatter_add_pallas)
and XLA's native scatter against a Pallas RMW loop over a VMEM-resident
[N, W] accumulator (the backward twin of the loop gather in
scripts/gather_microbench.py).

Usage: python scripts/scatter_microbench.py
"""

from __future__ import annotations

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

from mpa_tpu.ops.pallas.gather_pallas import scatter_add_pallas


def scatter_xla(g, idx, N):
    B, E, W = g.shape
    return (
        jnp.zeros((B, N, W), jnp.float32)
        .at[jnp.arange(B)[:, None], idx]
        .add(g, mode="drop")
    )


def _rmw_kernel(idx_ref, g_ref, out_ref, *, T: int, rpi: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base0 = pl.program_id(0) * T

    def body(i, _):
        for r in range(rpi):
            e = i * rpi + r
            t = idx_ref[base0 + e]
            out_ref[pl.ds(t, 1), :] += g_ref[pl.ds(e, 1), :]
        return 0

    jax.lax.fori_loop(0, T // rpi, body, 0)


@functools.partial(jax.jit, static_argnames=("N", "rpi", "T"))
def scatter_rmw(g, idx, N: int, rpi: int = 8, T: int = 2048):
    B, E, W = g.shape
    assert E % T == 0

    def one(g_b, idx_b):
        return pl.pallas_call(
            functools.partial(_rmw_kernel, T=T, rpi=rpi),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(E // T,),
                in_specs=[pl.BlockSpec((T, W), lambda i, idx_ref: (i, 0))],
                out_specs=pl.BlockSpec((N, W), lambda i, idx_ref: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        )(idx_b, g_b)

    return jax.vmap(one)(g, idx)


REPS = 16


def bench(fn, g, idx, iters=8):
    @jax.jit
    def many(g, idx):
        def body(i, acc):
            out = fn(g + acc, idx)
            return acc + jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(many(g, idx))
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = many(g, idx)
    float(acc)
    dt = (time.perf_counter() - t0) / iters / REPS
    rows = idx.shape[0] * idx.shape[1]
    return dt, dt / rows * 1e9


def main():
    r = np.random.default_rng(0)
    for B, N, W, E in [(8, 2048, 128, 16384), (8, 1024, 128, 8192),
                       (8, 1024, 256, 8192), (8, 4096, 128, 32768)]:
        g = jnp.asarray(r.normal(size=(B, E, W)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, E)).astype(np.int32))
        ref = scatter_xla(g, idx, N)
        print(f"B{B} N{N} W{W} E{E}:", flush=True)
        cases = [
            ("xla", lambda g, i: scatter_xla(g, i, N)),
            ("onehot", lambda g, i: scatter_add_pallas(g, i, N)),
            ("rmw8", lambda g, i: scatter_rmw(g, i, N, rpi=8)),
            ("rmw16", lambda g, i: scatter_rmw(g, i, N, rpi=16)),
        ]
        for name, fn in cases:
            try:
                out = fn(g, idx)
                err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
                dt, ns = bench(fn, g, idx)
                print(f"  {name:7s} {dt*1e3:8.3f} ms  {ns:6.2f} ns/row  relerr={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"  {name:7s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
