"""CI coverage for the four Pallas TPU kernels via
``pltpu.force_tpu_interpret_mode()`` — runs the actual kernel bodies on CPU
and asserts agreement with the XLA paths (VERDICT r1 item 4). Edges covered:
non-128-multiple N, tied distances (duplicate points), k near the lane width,
unclaimed scatter slots, keyed/fixed FPS starts, and the custom-VJP backward.

One on-TPU smoke for the same kernels lives in scripts/tpu_kernel_smoke.py
(runnable via the verify skill; the CI image pins tests to CPU)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpa_tpu import ops  # noqa: E402
from mpa_tpu.ops.pallas.knn_pallas import knn_indices_pallas, knn_pallas  # noqa: E402
from mpa_tpu.ops.pallas.fps_pallas import farthest_point_sample_pallas  # noqa: E402
from mpa_tpu.ops.pallas.scatter_pallas import scatter_mean_upsample_pallas  # noqa: E402
from mpa_tpu.ops.pallas.gather_pallas import (  # noqa: E402
    gather_neighbors,
    scatter_add_pallas,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def rng(seed=0):
    return np.random.default_rng(seed)


class TestKnnKernel:
    @pytest.mark.parametrize(
        "N,S,k",
        [
            (100, 33, 8),     # padded N (100 -> 128), ragged S
            (128, 128, 8),    # exact lane width
            (130, 7, 16),     # N just past a lane boundary, tiny S
            (96, 24, 63),     # k near the 64 sublane edge
        ],
    )
    def test_indices_match_xla(self, N, S, k):
        r = rng(N + S + k)
        base = jnp.asarray(r.normal(size=(2, N, 3)).astype(np.float32))
        query = jnp.asarray(r.normal(size=(2, S, 3)).astype(np.float32))
        got = np.asarray(knn_indices_pallas(k, base, query))
        _, want = ops.knn(k, base, query, method="sort")
        np.testing.assert_array_equal(got, np.asarray(want))

    def test_tied_distances_pick_lowest_index(self):
        """Duplicate points: both the kernel and lax.top_k must break ties by
        lowest base index."""
        r = rng(7)
        pts = r.normal(size=(1, 40, 3)).astype(np.float32)
        pts[0, 20:40] = pts[0, 0:20]  # every point duplicated once
        base = jnp.asarray(np.concatenate([pts, pts], 0).reshape(2, 40, 3))
        query = base[:, :10, :]
        got = np.asarray(knn_indices_pallas(4, base, query))
        _, want = ops.knn(4, base, query, method="sort")
        np.testing.assert_array_equal(got, np.asarray(want))
        # self must be first, its duplicate second
        np.testing.assert_array_equal(got[:, :, 0], np.arange(10)[None, :].repeat(2, 0))
        np.testing.assert_array_equal(got[:, :, 1], 20 + np.arange(10)[None, :].repeat(2, 0))

    def test_wrapper_distances_differentiable(self):
        r = rng(3)
        base = jnp.asarray(r.normal(size=(1, 64, 3)).astype(np.float32))
        query = jnp.asarray(r.normal(size=(1, 16, 3)).astype(np.float32))

        def f(b, q):
            d, _ = knn_pallas(4, b, q)
            return jnp.sum(d)

        def f_xla(b, q):
            d, _ = ops.knn(4, b, q, method="sort")
            return jnp.sum(d)

        gb, gq = jax.grad(f, argnums=(0, 1))(base, query)
        wb, wq = jax.grad(f_xla, argnums=(0, 1))(base, query)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(wb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(wq), atol=1e-5)


class TestBallQueryKernel:
    """Fused ball grouping (ops/pallas/ball_pallas.py, r5): replaces the
    [B, S, N] marked-index top_k that XLA lowers to a FULL SORT (7.35 ms/step
    on repsurf_ssg_2x). Sentinel-stage output must match the XLA formulation
    everywhere except points whose distance sits within float noise of the
    radius boundary (the two paths compute d at different matmul precisions —
    same documented caveat as the kNN kernel)."""

    @staticmethod
    def _oracle_sentinel(radius, nsample, xyz, new_xyz):
        B, N, _ = xyz.shape
        d = ops.square_distance(new_xyz, xyz)
        arange = jnp.arange(N, dtype=jnp.int32)[None, None, :]
        marked = jnp.where(d <= radius * radius, arange, N)
        neg, _ = jax.lax.top_k(-marked, nsample)
        return -neg

    @staticmethod
    def check_ball_semantics(got, d, radius, N, ns, tol=1e-4):
        """Direct semantics check, immune to the slot-shift cascade a single
        boundary disagreement causes in an element-wise compare: picks must
        be (a) ascending unique with sentinels only at the tail, (b) inside
        the radius within float tolerance, and (c) complete — no robustly
        in-radius index below the selection horizon may be missing."""
        r2 = radius * radius
        B, S, _ = got.shape
        for b in range(B):
            for s in range(S):
                row = got[b, s]
                picks = row[row < N]
                assert np.all(row[len(picks):] == N), (b, s, row)
                if len(picks) > 1:
                    assert np.all(np.diff(picks) > 0), (b, s, picks)
                if len(picks):
                    assert np.all(d[b, s, picks] <= r2 + tol), (
                        b, s, d[b, s, picks].max(), r2
                    )
                inside = np.where(d[b, s] < r2 - tol)[0]
                if len(picks) < ns:
                    missing = np.setdiff1d(inside, picks)
                else:
                    lim = picks[-1]
                    missing = np.setdiff1d(inside[inside < lim], picks)
                assert missing.size == 0, (b, s, missing)

    @pytest.mark.parametrize(
        "N,S,ns,radius",
        [
            (100, 33, 8, 0.6),    # padded N, ragged S
            (128, 128, 24, 0.3),  # the 2x model's nsample (fori_loop path)
            (257, 40, 4, 0.2),    # sparse balls -> many sentinel slots
            (64, 16, 64, 3.0),    # everything in radius, nsample == N
        ],
    )
    def test_matches_xla_formulation(self, N, S, ns, radius):
        from mpa_tpu.ops.pallas.ball_pallas import ball_query_indices_pallas

        r = rng(7)
        xyz = jnp.asarray(r.normal(size=(2, N, 3)).astype(np.float32))
        q = xyz[:, :S]
        want = np.asarray(self._oracle_sentinel(radius, ns, xyz, q))
        got = np.asarray(ball_query_indices_pallas(radius, ns, xyz, q))
        if not np.array_equal(want, got):
            d = np.asarray(ops.square_distance(q, xyz))
            self.check_ball_semantics(got, d, radius, N, ns)

    def test_identical_points_degenerate(self):
        from mpa_tpu.ops.pallas.ball_pallas import ball_query_indices_pallas

        xyz = jnp.ones((2, 256, 3))
        want = np.asarray(self._oracle_sentinel(0.5, 16, xyz, xyz[:, :64]))
        got = np.asarray(ball_query_indices_pallas(0.5, 16, xyz, xyz[:, :64]))
        np.testing.assert_array_equal(want, got)


class TestFpsKernel:
    @pytest.mark.parametrize("N,npoint", [(100, 30), (128, 64), (257, 128), (64, 64)])
    def test_matches_xla_fixed_start(self, N, npoint):
        r = rng(N)
        pts = jnp.asarray(r.normal(size=(3, N, 3)).astype(np.float32))
        got = np.asarray(farthest_point_sample_pallas(pts, npoint))
        want = np.asarray(ops.farthest_point_sample(pts, npoint, use_pallas=False))
        np.testing.assert_array_equal(got, want)

    def test_matches_xla_keyed_start(self):
        r = rng(11)
        pts = jnp.asarray(r.normal(size=(2, 90, 3)).astype(np.float32))
        key = jax.random.key(5)
        got = np.asarray(farthest_point_sample_pallas(pts, 16, key=key))
        want = np.asarray(ops.farthest_point_sample(pts, 16, key=key, use_pallas=False))
        np.testing.assert_array_equal(got, want)

    def test_duplicate_points(self):
        """All-identical tail: argmax over -inf-masked padding must never pick
        a padded lane."""
        r = rng(13)
        pts = r.normal(size=(1, 70, 3)).astype(np.float32)
        pts[0, 35:] = pts[0, 0]  # half the cloud coincident
        pts = jnp.asarray(pts)
        got = np.asarray(farthest_point_sample_pallas(pts, 40))
        want = np.asarray(ops.farthest_point_sample(pts, 40, use_pallas=False))
        np.testing.assert_array_equal(got, want)
        assert got.max() < 70


class TestScatterMeanKernel:
    def _case(self, B=2, S=24, K=8, num_fine=100, seed=0):
        r = rng(seed)
        feats = jnp.asarray(r.normal(size=(B, S, 16)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, num_fine, size=(B, S, K)).astype(np.int32))
        return feats, idx, num_fine

    def test_matches_xla(self):
        feats, idx, num_fine = self._case()
        got = np.asarray(scatter_mean_upsample_pallas(feats, idx, num_fine))
        want = np.asarray(ops.scatter_mean_upsample(feats, idx, num_fine, use_pallas=False))
        # num_fine=100 guarantees unclaimed slots; both must zero them.
        assert np.any(np.all(want == 0.0, axis=-1))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_s_chunked_accumulation(self):
        """S above the kernel's 2048-row chunk exercises the multi-chunk
        accumulate path (found as a VMEM OOM in 16k-point scenes: an
        unchunked S=8192 blew the scoped limit)."""
        feats, idx, num_fine = self._case(B=1, S=2056, K=4, num_fine=256, seed=5)
        got = np.asarray(scatter_mean_upsample_pallas(feats, idx, num_fine))
        want = np.asarray(ops.scatter_mean_upsample(feats, idx, num_fine, use_pallas=False))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_backward_matches_xla(self):
        feats, idx, num_fine = self._case(seed=2)

        def f(fe):
            return jnp.sum(scatter_mean_upsample_pallas(fe, idx, num_fine) ** 2)

        def f_xla(fe):
            return jnp.sum(ops.scatter_mean_upsample(fe, idx, num_fine, use_pallas=False) ** 2)

        got = np.asarray(jax.grad(f)(feats))
        want = np.asarray(jax.grad(f_xla)(feats))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_all_claim_one_slot(self):
        """Degenerate: every coarse point claims slot 0 (count = S*K)."""
        B, S, K, C = 1, 8, 4, 8
        feats = jnp.asarray(rng(3).normal(size=(B, S, C)).astype(np.float32))
        idx = jnp.zeros((B, S, K), jnp.int32)
        got = np.asarray(scatter_mean_upsample_pallas(feats, idx, 10))
        want = np.asarray(ops.scatter_mean_upsample(feats, idx, 10, use_pallas=False))
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestGatherScatterAdd:
    def test_scatter_add_matches_segment_sum(self):
        r = rng(4)
        B, Sp, C, N = 2, 300, 8, 77
        g = jnp.asarray(r.normal(size=(B, Sp, C)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, Sp)).astype(np.int32))
        got = np.asarray(scatter_add_pallas(g, idx, N))
        off = jnp.arange(B, dtype=jnp.int32)[:, None] * N
        seg = (idx + off).reshape(-1)
        want = np.asarray(
            jax.ops.segment_sum(g.reshape(-1, C), seg, num_segments=B * N).reshape(B, N, C)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_gather_forward_and_vjp(self):
        r = rng(5)
        pts = jnp.asarray(r.normal(size=(2, 50, 12)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, 50, size=(2, 20, 6)).astype(np.int32))
        got = np.asarray(gather_neighbors(pts, idx))
        want = np.asarray(ops.index_points(pts, idx))
        np.testing.assert_array_equal(got, want)

        w = jnp.asarray(r.normal(size=got.shape).astype(np.float32))

        def f(p):
            return jnp.sum(gather_neighbors(p, idx) * w)

        def f_xla(p):
            return jnp.sum(ops.index_points(p, idx) * w)

        np.testing.assert_allclose(
            np.asarray(jax.grad(f)(pts)), np.asarray(jax.grad(f_xla)(pts)), atol=1e-5
        )


class TestLoopGather:
    """r3 forward kernel: VMEM-resident slab + dynamic sublane slices
    (gather_pallas.loop_gather_rows). Bit-exact vs the XLA row gather."""

    @pytest.mark.parametrize(
        "B,N,W,E",
        [
            (2, 512, 128, 2048),   # production attention-shape slab
            (1, 100, 12, 530),     # ragged everything (padding path)
            (3, 2048, 8, 4096),    # narrow width, big N
        ],
    )
    def test_matches_xla_gather(self, B, N, W, E):
        from mpa_tpu.ops.pallas.gather_pallas import loop_gather_rows

        r = rng(11)
        pts = jnp.asarray(r.normal(size=(B, N, W)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, E)).astype(np.int32))
        got = np.asarray(loop_gather_rows(pts, idx))
        want = np.asarray(jnp.take_along_axis(pts, idx[..., None], axis=1))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "B,N,W,E",
        [
            (2, 512, 128, 2048),
            (1, 100, 12, 530),  # ragged everything (padding path)
        ],
    )
    def test_batchgrid_variant_matches(self, B, N, W, E, interpret_mode, monkeypatch):
        """Opt-in batch-in-grid launch (grid (B, E/T), one kernel): bit-exact
        vs the default vmap-of-launches path."""
        from mpa_tpu.ops.pallas import gather_pallas as gp

        r = rng(13)
        pts = jnp.asarray(r.normal(size=(B, N, W)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, E)).astype(np.int32))
        want = np.asarray(gp.loop_gather_rows(pts, idx))
        monkeypatch.setattr(gp, "BATCHGRID_MAX_PREFETCH_BYTES", 1 << 30)
        got = np.asarray(gp.loop_gather_rows(pts, idx))
        np.testing.assert_array_equal(got, want)

    def test_dispatch_falls_back_off_tpu(self):
        """On this CPU suite, fast_gather_rows must route to XLA (eligibility
        gate) and still be exact."""
        from mpa_tpu.ops.pallas.gather_pallas import (
            fast_gather_rows,
            loop_gather_eligible,
        )

        r = rng(12)
        pts = jnp.asarray(r.normal(size=(2, 64, 16)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, 64, size=(2, 600)).astype(np.int32))
        assert not loop_gather_eligible(pts, 600)
        got = np.asarray(fast_gather_rows(pts, idx))
        want = np.asarray(jnp.take_along_axis(pts, idx[..., None], axis=1))
        np.testing.assert_array_equal(got, want)


class TestRmwScatter:
    """r3 backward kernel: sequential read-modify-write into a VMEM
    accumulator (gather_pallas.scatter_add_rmw). Exact f32 adds."""

    @pytest.mark.parametrize(
        "B,E,W,N",
        [
            (2, 2048, 64, 4096),   # production crossover shape
            (1, 530, 8, 4100),     # ragged E (padding rows must drop)
        ],
    )
    def test_matches_segment_sum(self, B, E, W, N):
        from mpa_tpu.ops.pallas.gather_pallas import scatter_add_rmw

        r = rng(13)
        g = jnp.asarray(r.normal(size=(B, E, W)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, E)).astype(np.int32))
        got = np.asarray(scatter_add_rmw(g, idx, N))
        off = jnp.arange(B, dtype=jnp.int32)[:, None] * N
        seg = (idx + off).reshape(-1)
        want = np.asarray(
            jax.ops.segment_sum(
                g.reshape(-1, W), seg, num_segments=B * N
            ).reshape(B, N, W)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_out_of_range_targets_drop(self):
        """Sentinel targets (< 0 or >= N) contribute nothing — the XLA path's
        mode='drop' semantics."""
        from mpa_tpu.ops.pallas.gather_pallas import scatter_add_rmw

        r = rng(14)
        B, E, W, N = 1, 512, 16, 4096
        g = jnp.asarray(r.normal(size=(B, E, W)).astype(np.float32))
        idx = np.asarray(r.integers(0, N, size=(B, E)).astype(np.int32))
        idx[0, ::5] = N          # sentinel beyond range
        idx[0, 1::7] = -1        # negative sentinel
        got = np.asarray(scatter_add_rmw(g, jnp.asarray(idx), N))
        keep = (idx[0] >= 0) & (idx[0] < N)
        want = np.asarray(
            jax.ops.segment_sum(
                jnp.asarray(np.asarray(g[0])[keep]),
                jnp.asarray(idx[0][keep]),
                num_segments=N,
            )
        )
        np.testing.assert_allclose(got[0], want, atol=1e-5)
        # slot 0 (the clamp target) must carry ONLY real slot-0 mass
        np.testing.assert_allclose(got[0, 0], want[0], atol=1e-5)


class TestTransitionAttentionKernel:
    @pytest.fixture(autouse=True, params=["small", "large"])
    def _both_paths(self, request, monkeypatch):
        """Run every attention test through BOTH dispatches: the fused
        small-N path (in-VMEM one-hot gather) and the large path (XLA row
        gather + fused backward scatter)."""
        from mpa_tpu.ops.pallas import attention_pallas as AP

        if request.param == "large":
            monkeypatch.setattr(AP, "SMALL_N_THRESHOLD", 0)
        yield

    def _case(self, B=2, N=100, S=37, K=8, C=16, nB=2, seed=0):
        from mpa_tpu.ops.pallas.attention_pallas import transition_attention

        r = rng(seed)
        packed = np.asarray(r.normal(size=(B, N, nB * 2 * C)).astype(np.float32))
        for b in range(nB):  # E channels carry exp(...) > 0 (model invariant)
            packed[..., 2 * b * C : (2 * b + 1) * C] = np.exp(
                packed[..., 2 * b * C : (2 * b + 1) * C]
            )
        packed = jnp.asarray(packed)
        idx = jnp.asarray(r.integers(0, N, size=(B, S, K)).astype(np.int32))
        shifts = jnp.asarray(r.normal(size=(B, S, nB * C)).astype(np.float32))
        return transition_attention, packed, idx, shifts, nB, C

    @pytest.mark.parametrize("nB,S", [(1, 64), (2, 37), (2, 128)])
    def test_forward_matches_xla(self, nB, S):
        ta, packed, idx, shifts, nB, C = self._case(S=S, nB=nB)
        got = np.asarray(ta(packed, idx, shifts, nB, C, use_pallas=True))
        want = np.asarray(ta(packed, idx, shifts, nB, C, use_pallas=False))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_none_shifts(self):
        ta, packed, idx, shifts, nB, C = self._case(seed=3)
        got = np.asarray(ta(packed, idx, None, nB, C, use_pallas=True))
        want = np.asarray(ta(packed, idx, None, nB, C, use_pallas=False))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_backward_matches_xla(self):
        from mpa_tpu.ops.pallas import attention_pallas as AP

        ta, packed, idx, shifts, nB, C = self._case(seed=1)
        w = jnp.asarray(rng(9).normal(size=(2, 37, nB * C)).astype(np.float32))

        def f(use):
            def loss(p, s):
                return jnp.sum(ta(p, idx, s, nB, C, use_pallas=use) * w)
            return jax.grad(loss, argnums=(0, 1))(packed, shifts)

        wp, ws = f(False)
        # Exact mode: hilo backward scatter reproduces XLA to fp noise.
        orig = AP.GRAD_SCATTER_PRECISION
        try:
            AP.GRAD_SCATTER_PRECISION = "hilo"
            gp, gs = f(True)
        finally:
            AP.GRAD_SCATTER_PRECISION = orig
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), atol=1e-5)
        # Production mode (bf16 single-pass scatter): each addend is rounded
        # at ~0.4% of its own magnitude, so the right bound is absolute error
        # against the gradient SCALE (element-wise relative bounds break down
        # where summed contributions cancel).
        gp2, gs2 = f(True)
        np.testing.assert_allclose(np.asarray(gs2), np.asarray(ws), atol=1e-5)
        err = np.abs(np.asarray(gp2) - np.asarray(wp))
        scale = np.abs(np.asarray(wp)).max()
        assert float(err.max()) < 0.01 * scale, (
            f"bf16 scatter err {err.max()} vs grad scale {scale}"
        )

    def test_tied_max_gradient_convention(self):
        """Duplicate neighbour indices force exact ties in the K-max; the
        kernel must split the gradient like XLA's reduce_max VJP."""
        from mpa_tpu.ops.pallas.attention_pallas import transition_attention as ta

        r = rng(4)
        B, N, S, K, C = 1, 20, 10, 6, 8
        packed = np.asarray(r.normal(size=(B, N, 2 * C)).astype(np.float32))
        packed[..., :C] = np.exp(packed[..., :C])
        packed = jnp.asarray(packed)
        idx_np = r.integers(0, N, size=(B, S, K)).astype(np.int32)
        idx_np[..., 1] = idx_np[..., 0]  # duplicated neighbour -> tied w
        idx = jnp.asarray(idx_np)
        w = jnp.asarray(r.normal(size=(B, S, C)).astype(np.float32))

        def f(use):
            return jax.grad(
                lambda p: jnp.sum(ta(p, idx, None, 1, C, use_pallas=use) * w)
            )(packed)

        # hilo scatter: the tie-splitting convention must match bit-for-bit
        # (precision mode is orthogonal to the convention under test).
        from mpa_tpu.ops.pallas import attention_pallas as AP

        orig = AP.GRAD_SCATTER_PRECISION
        try:
            AP.GRAD_SCATTER_PRECISION = "hilo"
            got = np.asarray(f(True))
        finally:
            AP.GRAD_SCATTER_PRECISION = orig
        np.testing.assert_allclose(got, np.asarray(f(False)), atol=1e-5)

    def test_bf16_storage_fwd_bwd(self):
        """bf16 storage dtype (mixed-precision model path): the kernel upcasts
        per-tile to f32 internally, so outputs/grads must track an f32 oracle
        fed the SAME bf16-rounded inputs to bf16 resolution."""
        ta, packed, idx, shifts, nB, C = self._case(seed=7, nB=2, S=64)
        packed16 = packed.astype(jnp.bfloat16)
        shifts16 = shifts.astype(jnp.bfloat16)
        # Oracle sees identical values: bf16-rounded, then run in f32.
        p32 = packed16.astype(jnp.float32)
        s32 = shifts16.astype(jnp.float32)
        w = jnp.asarray(rng(11).normal(size=(2, 64, nB * C)).astype(np.float32))

        out16 = ta(packed16, idx, shifts16, nB, C, use_pallas=True)
        assert out16.dtype == jnp.bfloat16
        out32 = ta(p32, idx, s32, nB, C, use_pallas=False)
        scale = float(np.abs(np.asarray(out32)).max())
        err = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
        assert float(err.max()) < 0.01 * scale, f"fwd err {err.max()} vs {scale}"

        def loss(use, p, s):
            return jnp.sum(
                ta(p, idx, s, nB, C, use_pallas=use).astype(jnp.float32) * w
            )

        gp16, gs16 = jax.grad(lambda p, s: loss(True, p, s), argnums=(0, 1))(
            packed16, shifts16
        )
        assert gp16.dtype == jnp.bfloat16 and gs16.dtype == jnp.bfloat16
        gp32, gs32 = jax.grad(lambda p, s: loss(False, p, s), argnums=(0, 1))(
            p32, s32
        )
        for g16, g32 in ((gp16, gp32), (gs16, gs32)):
            g16 = np.asarray(g16, np.float32)
            g32 = np.asarray(g32)
            assert np.isfinite(g16).all()
            scale = float(np.abs(g32).max())
            err = float(np.abs(g16 - g32).max())
            assert err < 0.02 * scale, f"bwd err {err} vs grad scale {scale}"


class TestLargeNBackward:
    """Above LARGE_N_SCATTER_THRESHOLD the attention backward leaves the
    fused one-hot kernel for a plain-XLA edge-gradient + native scatter
    (attention_pallas._bwd_scatter_xla) — the one-hot's E*Npad*W MXU FLOPs
    grow quadratically with scene size and its VMEM accumulator stops
    fitting at N=16384. Both the raw function and the dispatch must
    reproduce autodiff through the XLA reference."""

    def _case(self, seed=0, B=2, N=40, S=16, K=4, nB=2, C=8):
        from mpa_tpu.ops.pallas.attention_pallas import transition_attention

        r = rng(seed)
        packed = np.asarray(r.normal(size=(B, N, nB * 2 * C)).astype(np.float32))
        for b in range(nB):
            packed[..., 2 * b * C : (2 * b + 1) * C] = np.exp(
                packed[..., 2 * b * C : (2 * b + 1) * C]
            )
        packed = jnp.asarray(packed)
        idx = jnp.asarray(r.integers(0, N, size=(B, S, K)).astype(np.int32))
        shifts = jnp.asarray(r.normal(size=(B, S, nB * C)).astype(np.float32))
        w = jnp.asarray(r.normal(size=(B, S, nB * C)).astype(np.float32))
        return transition_attention, packed, idx, shifts, w, nB, C

    def test_bwd_scatter_xla_matches_autodiff(self):
        from mpa_tpu.ops.pallas import attention_pallas as AP

        ta, packed, idx, shifts, w, nB, C = self._case()
        wp, ws = jax.grad(
            lambda p, s: jnp.sum(ta(p, idx, s, nB, C, use_pallas=False) * w),
            argnums=(0, 1),
        )(packed, shifts)
        G = AP._gather(packed, idx)
        gp, gs = AP._bwd_scatter_xla(G, shifts, w, idx, packed.shape[1], nB, C)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), atol=1e-5)

    def test_bwd_scatter_xla_none_shifts(self):
        from mpa_tpu.ops.pallas import attention_pallas as AP

        ta, packed, idx, _, w, nB, C = self._case(seed=5)
        wp = jax.grad(
            lambda p: jnp.sum(ta(p, idx, None, nB, C, use_pallas=False) * w)
        )(packed)
        G = AP._gather(packed, idx)
        gp, gs = AP._bwd_scatter_xla(G, None, w, idx, packed.shape[1], nB, C)
        assert gs is None
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)

    def test_dispatch_through_custom_vjp(self, monkeypatch):
        """With the threshold lowered, the custom-VJP large-N path must route
        through _bwd_scatter_xla and still match autodiff end to end."""
        from mpa_tpu.ops.pallas import attention_pallas as AP

        ta, packed, idx, shifts, w, nB, C = self._case(seed=9)
        monkeypatch.setattr(AP, "LARGE_N_SCATTER_THRESHOLD", 8)
        monkeypatch.setattr(AP, "SMALL_N_THRESHOLD", 0)  # force the large path
        wp, ws = jax.grad(
            lambda p, s: jnp.sum(ta(p, idx, s, nB, C, use_pallas=False) * w),
            argnums=(0, 1),
        )(packed, shifts)
        gp, gs = jax.grad(
            lambda p, s: jnp.sum(ta(p, idx, s, nB, C, use_pallas=True) * w),
            argnums=(0, 1),
        )(packed, shifts)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), atol=1e-5)
