"""A/B: vmap-of-pallas_call loop gather (current) vs folding the batch into
the Pallas grid (one launch, slab refetched per batch element). Production
part-seg shapes. Prints one JSON line per shape."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpa_tpu.ops.pallas.gather_pallas import (
    _loop_gather_kernel,
    _round_up,
    loop_gather_rows,
    _LG_ROWS_PER_ITER,
)


def _bg_kernel(idx_ref, src_ref, out_ref, *, T: int, rpi: int):
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


def batchgrid_gather_rows(points, flat_idx):
    B, N, W = points.shape
    E = flat_idx.shape[1]
    rpi = _LG_ROWS_PER_ITER
    T = min(2048, _round_up(E, rpi))
    Ep = _round_up(E, T)
    ix = flat_idx.astype(jnp.int32)
    if Ep != E:
        ix = jnp.pad(ix, ((0, 0), (0, Ep - E)))
    out = pl.pallas_call(
        functools.partial(_bg_kernel, T=T, rpi=rpi),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Ep // T),
            in_specs=[pl.BlockSpec((1, N, W), lambda b, i, idx_ref: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, T, W), lambda b, i, idx_ref: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ep, W), points.dtype),
    )(ix, points)
    return out[:, :E] if Ep != E else out


def time_fn(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B = 8
    # (N, E, W): part-seg attention packed e||v gathers at the 4 scales +
    # decoder FP gathers.
    shapes = [
        (2048, 16384, 128),
        (512, 4096, 256),
        (128, 1024, 512),
        (2048, 6144, 64),
        (512, 8192, 128),
    ]
    for N, E, W in shapes:
        k = jax.random.key(0)
        src = jax.random.normal(k, (B, N, W), jnp.float32)
        idx = jax.random.randint(jax.random.key(1), (B, E), 0, N)
        vm = jax.jit(loop_gather_rows)
        bg = jax.jit(batchgrid_gather_rows)
        a = vm(src, idx)
        b = bg(src, idx)
        assert jnp.array_equal(a, b), (N, E, W)
        t_vm = time_fn(vm, src, idx)
        t_bg = time_fn(bg, src, idx)
        print(
            json.dumps(
                {
                    "N": N,
                    "E": E,
                    "W": W,
                    "vmap_ms": round(t_vm, 4),
                    "batchgrid_ms": round(t_bg, 4),
                    "speedup": round(t_vm / t_bg, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
