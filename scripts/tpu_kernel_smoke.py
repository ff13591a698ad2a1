"""On-TPU smoke for the four Pallas kernels (CI pins tests to CPU interpret
mode — tests/test_pallas_kernels.py; this script runs the compiled Mosaic
kernels on the real chip and checks them against the XLA paths).

Run: cd /root/repo && python scripts/tpu_kernel_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpa_tpu import ops
from mpa_tpu.ops.pallas.knn_pallas import knn_indices_pallas
from mpa_tpu.ops.pallas.fps_pallas import farthest_point_sample_pallas
from mpa_tpu.ops.pallas.scatter_pallas import scatter_mean_upsample_pallas
from mpa_tpu.ops.pallas.gather_pallas import gather_neighbors, scatter_add_pallas


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    r = np.random.default_rng(0)
    failures = 0

    base = jnp.asarray(r.normal(size=(4, 1000, 3)).astype(np.float32))
    query = jnp.asarray(r.normal(size=(4, 500, 3)).astype(np.float32))

    got = np.asarray(knn_indices_pallas(8, base, query))
    _, want = ops.knn(8, base, query, method="sort")
    want = np.asarray(want)
    # hilo3 MXU distances flip near-ties at ~1e-4 rate (documented,
    # docs/PERF.md): accept an index mismatch iff the picked neighbour's
    # exact distance is within rel 1e-3 of the oracle's pick.
    bnp, qnp = np.asarray(base), np.asarray(query)
    def _d2(idx, b, q):
        return np.sum((qnp[b, q] - bnp[b, idx]) ** 2)
    bad = 0
    for b, q, k in np.argwhere(got != want):
        dg, dw = _d2(got[b, q, k], b, q), _d2(want[b, q, k], b, q)
        bad += abs(dg - dw) > 1e-3 * max(dw, 1e-9)
    ok = bad == 0
    failures += not ok
    flips = int(np.sum(got != want))
    print(f"knn_indices_pallas: {'OK' if ok else 'MISMATCH'}"
          f" ({flips} near-tie flips, {bad} real)")

    got = np.asarray(farthest_point_sample_pallas(base, 250))
    want = np.asarray(ops.farthest_point_sample(base, 250, use_pallas=False))
    ok = np.array_equal(got, want)
    failures += not ok
    print(f"farthest_point_sample_pallas: {'OK' if ok else 'MISMATCH'}")

    # Ball grouping (r5): direct semantics check (ascending picks, in-radius
    # within float tol, completeness) — immune to the slot-shift cascade a
    # single boundary flip causes in an element-wise compare against the XLA
    # formulation (one dropped boundary point shifts every later slot).
    from mpa_tpu.ops.pallas.ball_pallas import ball_query_indices_pallas

    radius, ns, tol = 0.3, 24, 1e-4
    Nb = base.shape[1]
    got = np.asarray(ball_query_indices_pallas(radius, ns, base, query))
    d = np.asarray(ops.square_distance(query, base))
    r2 = radius * radius
    bad = 0
    for b in range(got.shape[0]):
        for s in range(got.shape[1]):
            row = got[b, s]
            picks = row[row < Nb]
            ok_row = np.all(row[len(picks):] == Nb)
            if len(picks) > 1:
                ok_row &= bool(np.all(np.diff(picks) > 0))
            if len(picks):
                ok_row &= bool(np.all(d[b, s, picks] <= r2 + tol))
            inside = np.where(d[b, s] < r2 - tol)[0]
            if len(picks) < ns:
                ok_row &= np.setdiff1d(inside, picks).size == 0
            else:
                ok_row &= np.setdiff1d(inside[inside < picks[-1]], picks).size == 0
            bad += not ok_row
    ok = bad == 0
    failures += not ok
    print(f"ball_query_indices_pallas: {'OK' if ok else 'MISMATCH'} ({bad} bad rows)")

    feats = jnp.asarray(r.normal(size=(4, 500, 64)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, 1000, size=(4, 500, 8)).astype(np.int32))
    got = np.asarray(scatter_mean_upsample_pallas(feats, idx, 1000))
    want = np.asarray(ops.scatter_mean_upsample(feats, idx, 1000, use_pallas=False))
    err = np.max(np.abs(got - want))
    ok = err < 1e-4
    failures += not ok
    print(f"scatter_mean_upsample_pallas: {'OK' if ok else 'MISMATCH'} (max err {err:.2e})")

    g = jnp.asarray(r.normal(size=(4, 4000, 64)).astype(np.float32))
    sidx = jnp.asarray(r.integers(0, 1000, size=(4, 4000)).astype(np.int32))
    got = np.asarray(scatter_add_pallas(g, sidx, 1000))
    off = jnp.arange(4, dtype=jnp.int32)[:, None] * 1000
    seg = (sidx + off).reshape(-1)
    want = np.asarray(
        jax.ops.segment_sum(g.reshape(-1, 64), seg, num_segments=4000).reshape(4, 1000, 64)
    )
    err = np.max(np.abs(got - want))
    ok = err < 1e-3
    failures += not ok
    print(f"scatter_add_pallas: {'OK' if ok else 'MISMATCH'} (max err {err:.2e})")

    from mpa_tpu.ops.pallas.attention_pallas import transition_attention

    packed = np.asarray(r.normal(size=(4, 1000, 256)).astype(np.float32))
    packed[..., :64] = np.exp(packed[..., :64])
    packed[..., 128:192] = np.exp(packed[..., 128:192])
    packed = jnp.asarray(packed)
    aidx = jnp.asarray(r.integers(0, 1000, size=(4, 500, 8)).astype(np.int32))
    got = np.asarray(transition_attention(packed, aidx, None, 2, 64, use_pallas=True))
    want = np.asarray(transition_attention(packed, aidx, None, 2, 64, use_pallas=False))
    err = np.max(np.abs(got - want))
    ok = err < 1e-4
    failures += not ok
    print(f"transition_attention fwd: {'OK' if ok else 'MISMATCH'} (max err {err:.2e})")
    gw = jnp.asarray(r.normal(size=got.shape).astype(np.float32))
    # Parity smoke runs the EXACT grad-scatter mode (like golden_equivalence):
    # the production bf16 default carries a documented ~2e-2 rounding band at
    # these shapes (docs/PERF.md) that would mask real kernel bugs here.
    from mpa_tpu.ops.pallas import attention_pallas as _AP

    _saved_prec = _AP.GRAD_SCATTER_PRECISION
    _AP.GRAD_SCATTER_PRECISION = "hilo"
    try:
        gp = jax.grad(
            lambda p: jnp.sum(transition_attention(p, aidx, None, 2, 64, use_pallas=True) * gw)
        )(packed)
        wp = jax.grad(
            lambda p: jnp.sum(transition_attention(p, aidx, None, 2, 64, use_pallas=False) * gw)
        )(packed)
    finally:
        _AP.GRAD_SCATTER_PRECISION = _saved_prec
    err = np.max(np.abs(np.asarray(gp) - np.asarray(wp)))
    ok = err < 1e-3
    failures += not ok
    print(f"transition_attention bwd (exact scatter): {'OK' if ok else 'MISMATCH'} (max err {err:.2e})")

    w = jnp.asarray(r.normal(size=(4, 500, 8, 64)).astype(np.float32))
    gf = jax.grad(lambda p: jnp.sum(gather_neighbors(p, idx) * w))(
        jnp.asarray(r.normal(size=(4, 1000, 64)).astype(np.float32))
    )
    ok = bool(jnp.all(jnp.isfinite(gf)))
    failures += not ok
    print(f"gather_neighbors VJP: {'OK' if ok else 'NON-FINITE'}")

    # r3 loop-gather forward (VMEM slab + dynamic sublane slices) — bit-exact
    from mpa_tpu.ops.pallas.gather_pallas import loop_gather_rows, scatter_add_rmw

    slab = jnp.asarray(r.normal(size=(4, 1024, 128)).astype(np.float32))
    lidx = jnp.asarray(r.integers(0, 1024, size=(4, 4096)).astype(np.int32))
    got = np.asarray(jax.jit(loop_gather_rows)(slab, lidx))
    want = np.asarray(jnp.take_along_axis(slab, lidx[..., None], axis=1))
    ok = np.array_equal(got, want)
    failures += not ok
    print(f"loop_gather_rows: {'OK' if ok else 'MISMATCH'}")

    # r3 RMW scatter-add (VMEM accumulator) vs segment-sum, incl. drop targets
    sg = jnp.asarray(r.normal(size=(4, 4096, 64)).astype(np.float32))
    tidx = np.asarray(r.integers(0, 4096, size=(4, 4096)).astype(np.int32))
    tidx[:, ::9] = 4096  # sentinel: must drop
    got = np.asarray(jax.jit(lambda g, i: scatter_add_rmw(g, i, 4096))(sg, jnp.asarray(tidx)))
    off = np.arange(4, dtype=np.int32)[:, None] * 4096
    keep = tidx < 4096
    seg = np.where(keep, tidx + off, 4 * 4096).reshape(-1)
    want = np.asarray(
        jax.ops.segment_sum(sg.reshape(-1, 64), jnp.asarray(seg), num_segments=4 * 4096 + 1)
    )[:-1].reshape(4, 4096, 64)
    err = np.max(np.abs(got - want))
    ok = err < 1e-3
    failures += not ok
    print(f"scatter_add_rmw: {'OK' if ok else 'MISMATCH'} (max err {err:.2e})")

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
