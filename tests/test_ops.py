"""Unit tests for L0 point-set ops against brute-force numpy oracles
(test strategy per SURVEY.md §4: tiny hand-checkable cases + property tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpa_tpu import ops


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSquareDistance:
    def test_matches_numpy(self):
        r = rng()
        a = r.normal(size=(2, 5, 3)).astype(np.float32)
        b = r.normal(size=(2, 7, 3)).astype(np.float32)
        got = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
        want = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nonnegative(self):
        a = jnp.ones((1, 4, 3)) * 1e3
        d = ops.square_distance(a, a)
        assert np.all(np.asarray(d) >= 0.0)


class TestIndexPoints:
    def test_2d_idx(self):
        pts = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
        idx = jnp.array([[0, 5], [2, 2]], dtype=jnp.int32)
        out = np.asarray(ops.index_points(pts, idx))
        assert out.shape == (2, 2, 3)
        np.testing.assert_array_equal(out[0, 1], np.asarray(pts)[0, 5])
        np.testing.assert_array_equal(out[1, 0], np.asarray(pts)[1, 2])

    def test_3d_idx(self):
        pts = jnp.arange(1 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 2)
        idx = jnp.array([[[1, 0], [3, 3]]], dtype=jnp.int32)  # [1, 2, 2]
        out = np.asarray(ops.index_points(pts, idx))
        assert out.shape == (1, 2, 2, 2)
        np.testing.assert_array_equal(out[0, 1, 0], np.asarray(pts)[0, 3])


class TestResortPoints:
    def test_permutes_group_dim(self):
        r = rng(1)
        pts = r.normal(size=(2, 3, 4, 5)).astype(np.float32)
        perm = np.stack(
            [np.stack([r.permutation(4) for _ in range(3)]) for _ in range(2)]
        ).astype(np.int32)
        out = np.asarray(ops.resort_points(jnp.asarray(pts), jnp.asarray(perm)))
        for b in range(2):
            for n in range(3):
                np.testing.assert_array_equal(out[b, n], pts[b, n][perm[b, n]])


class TestKnn:
    def test_matches_bruteforce(self):
        r = rng(2)
        base = r.normal(size=(2, 32, 3)).astype(np.float32)
        query = r.normal(size=(2, 8, 3)).astype(np.float32)
        d, idx = ops.knn(4, jnp.asarray(base), jnp.asarray(query))
        d, idx = np.asarray(d), np.asarray(idx)
        full = np.sum((query[:, :, None, :] - base[:, None, :, :]) ** 2, axis=-1)
        want_idx = np.argsort(full, axis=-1)[..., :4]
        np.testing.assert_array_equal(idx, want_idx)
        np.testing.assert_allclose(
            d, np.take_along_axis(full, want_idx, axis=-1), atol=1e-4
        )

    def test_self_knn_first_is_self(self):
        r = rng(3)
        pts = r.normal(size=(1, 16, 3)).astype(np.float32)
        _, idx = ops.knn_self(3, jnp.asarray(pts))
        np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(16))


class TestFps:
    def _brute_fps(self, pts, npoint, start=0):
        N = pts.shape[0]
        sel = [start]
        mind = np.full((N,), np.inf)
        for _ in range(npoint - 1):
            d = np.sum((pts - pts[sel[-1]]) ** 2, axis=-1)
            mind = np.minimum(mind, d)
            sel.append(int(np.argmax(mind)))
        return np.array(sel)

    def test_matches_bruteforce(self):
        r = rng(4)
        pts = r.normal(size=(2, 24, 3)).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(pts), 6))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], self._brute_fps(pts[b], 6))

    def test_unique_indices(self):
        r = rng(5)
        pts = r.normal(size=(3, 50, 3)).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(pts), 20))
        for b in range(3):
            assert len(np.unique(idx[b])) == 20

    def test_random_start_uses_key(self):
        pts = jnp.asarray(rng(6).normal(size=(4, 30, 3)).astype(np.float32))
        i1 = ops.farthest_point_sample(pts, 5, key=jax.random.key(0))
        i2 = ops.farthest_point_sample(pts, 5, key=jax.random.key(1))
        assert not np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_feature_space_fps(self):
        # FPS must accept C != 3 (reference runs FPS on feature tensors,
        # models/repsurf/repsurface_utils_part.py:4641).
        pts = jnp.asarray(rng(7).normal(size=(1, 20, 64)).astype(np.float32))
        idx = ops.farthest_point_sample(pts, 8)
        assert idx.shape == (1, 8)

    def test_jit_compatible(self):
        pts = jnp.asarray(rng(8).normal(size=(2, 16, 3)).astype(np.float32))
        f = jax.jit(lambda p: ops.farthest_point_sample(p, 4))
        np.testing.assert_array_equal(
            np.asarray(f(pts)), np.asarray(ops.farthest_point_sample(pts, 4))
        )


class TestBandedFps:
    def test_one_band_is_exact(self):
        pts = jnp.asarray(rng(40).normal(size=(2, 32, 3)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(ops.banded_farthest_point_sample(pts, 8, 1)),
            np.asarray(ops.farthest_point_sample(pts, 8)),
        )

    def test_is_per_band_exact_fps(self):
        # Each band's block must equal exact FPS run on that band's slice,
        # with indices offset into the global range.
        r = rng(41)
        pts = r.normal(size=(2, 64, 3)).astype(np.float32)
        G, nb, pb = 4, 16, 4
        idx = np.asarray(
            ops.banded_farthest_point_sample(jnp.asarray(pts), G * pb, G)
        ).reshape(2, G, pb)
        for b in range(2):
            for g in range(G):
                want = np.asarray(
                    ops.farthest_point_sample(
                        jnp.asarray(pts[b : b + 1, g * nb : (g + 1) * nb]), pb
                    )
                )[0] + g * nb
                np.testing.assert_array_equal(idx[b, g], want)

    def test_band_ranges_disjoint_and_unique(self):
        pts = jnp.asarray(rng(42).normal(size=(3, 128, 3)).astype(np.float32))
        idx = np.asarray(ops.banded_farthest_point_sample(pts, 32, 8))
        for b in range(3):
            assert len(np.unique(idx[b])) == 32
            blocks = idx[b].reshape(8, 4)
            for g in range(8):
                assert blocks[g].min() >= g * 16 and blocks[g].max() < (g + 1) * 16

    def test_rejects_nondivisible(self):
        pts = jnp.asarray(rng(43).normal(size=(1, 30, 3)).astype(np.float32))
        with pytest.raises(ValueError):
            ops.banded_farthest_point_sample(pts, 10, 4)

    def test_pick_fps_bands(self):
        # 16k scene, halving scales: bands bounded by both floors.
        assert ops.pick_fps_bands(16384, 8192) == 32  # band 512, 256 samples
        assert ops.pick_fps_bands(4096, 2048) == 8  # band 512, 256 samples
        assert ops.pick_fps_bands(2048, 64) == 1  # samples floor binds
        assert ops.pick_fps_bands(512, 256) == 1  # band floor binds
        assert ops.pick_fps_bands(30, 10) == 1  # non-divisible


class TestBallQuery:
    def test_matches_reference_semantics(self):
        r = rng(9)
        base = r.uniform(size=(2, 20, 3)).astype(np.float32)
        centres = base[:, :5, :]
        radius, nsample = 0.4, 6
        idx = np.asarray(
            ops.ball_query(radius, nsample, jnp.asarray(base), jnp.asarray(centres))
        )
        full = np.sum((centres[:, :, None, :] - base[:, None, :, :]) ** 2, axis=-1)
        for b in range(2):
            for s in range(5):
                hits = np.where(full[b, s] <= radius**2)[0]
                want = list(hits[:nsample])
                want += [want[0]] * (nsample - len(want))  # backfill with first
                np.testing.assert_array_equal(idx[b, s], want)

    def test_in_radius(self):
        r = rng(10)
        base = r.uniform(size=(1, 30, 3)).astype(np.float32)
        centres = base[:, ::3, :]
        idx = np.asarray(ops.ball_query(0.5, 8, jnp.asarray(base), jnp.asarray(centres)))
        gathered = np.take_along_axis(
            base[:, None].repeat(10, 1), idx[..., None].repeat(3, -1), axis=2
        )
        d = np.sum((gathered - centres[:, :, None, :]) ** 2, axis=-1)
        assert np.all(d <= 0.25 + 1e-6)


class TestScatterMeanUpsample:
    def test_matches_dense_oracle(self):
        r = rng(11)
        B, S, K, C, N = 2, 4, 3, 5, 8
        feats = r.normal(size=(B, S, C)).astype(np.float32)
        idx = r.integers(0, N, size=(B, S, K)).astype(np.int32)
        got = np.asarray(
            ops.scatter_mean_upsample(jnp.asarray(feats), jnp.asarray(idx), N)
        )
        want = np.zeros((B, N, C), np.float32)
        cnt = np.zeros((B, N), np.float32)
        for b in range(B):
            for s in range(S):
                for k in range(K):
                    want[b, idx[b, s, k]] += feats[b, s]
                    cnt[b, idx[b, s, k]] += 1
        want /= np.maximum(cnt, 1)[..., None]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_unclaimed_slots_zero(self):
        feats = jnp.ones((1, 2, 3))
        idx = jnp.zeros((1, 2, 2), dtype=jnp.int32)  # everything claims slot 0
        out = np.asarray(ops.scatter_mean_upsample(feats, idx, 4))
        np.testing.assert_array_equal(out[0, 1:], 0.0)
        np.testing.assert_allclose(out[0, 0], 1.0)


class TestThreeNnInterpolate:
    def test_exact_on_coincident_points(self):
        r = rng(12)
        coarse = r.normal(size=(1, 6, 3)).astype(np.float32)
        feats = r.normal(size=(1, 6, 4)).astype(np.float32)
        # Fine points == coarse points: interpolation must return the feature.
        out = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(coarse), jnp.asarray(coarse), jnp.asarray(feats)
            )
        )
        np.testing.assert_allclose(out, feats, atol=1e-3)

    def test_weights_sum_to_one(self):
        r = rng(13)
        fine = r.normal(size=(2, 10, 3)).astype(np.float32)
        coarse = r.normal(size=(2, 5, 3)).astype(np.float32)
        ones = np.ones((2, 5, 1), np.float32)
        out = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(fine), jnp.asarray(coarse), jnp.asarray(ones)
            )
        )
        np.testing.assert_allclose(out, 1.0, atol=1e-5)


class TestSubsample:
    def test_deterministic_is_prefix(self):
        pts = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
        out = ops.subsample_points(pts, 4)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(pts)[:, :4])

    def test_random_no_replacement(self):
        pts = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, :, None], (2, 1, 3))
        out = np.asarray(ops.subsample_points(pts, 8, key=jax.random.key(0)))
        for b in range(2):
            assert len(np.unique(out[b, :, 0])) == 8


class TestInnerCorrelation:
    """Reference: models/repsurf/repsurf_ssg_umb.py:25-32 (cosine Gram)."""

    def test_matches_numpy(self):
        r = rng(3)
        z = r.normal(size=(2, 6, 4)).astype(np.float32)
        got = np.asarray(ops.inner_correlation(jnp.asarray(z)))
        zn = z / np.maximum(
            np.linalg.norm(z, axis=-1, keepdims=True), 1e-12
        )
        want = zn @ zn.transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # Diagonal = self-similarity = 1 for nonzero rows.
        np.testing.assert_allclose(
            np.diagonal(got, axis1=1, axis2=2), 1.0, atol=1e-5
        )

    def test_zero_rows_and_index(self):
        r = rng(4)
        z = r.normal(size=(1, 5, 3)).astype(np.float32)
        z[0, 2] = 0.0  # degenerate row: F.normalize clamp keeps it finite
        idx = np.array([[2, 0, 4]], dtype=np.int32)
        got = np.asarray(
            ops.inner_correlation(jnp.asarray(z), jnp.asarray(idx))
        )
        assert got.shape == (1, 3, 3)
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got[0, 0, :], 0.0, atol=1e-6)  # zero row

    def test_zero_rows_grad_finite(self):
        # sqrt(max(|z|^2, eps)) keeps the clamped branch's gradient at 0
        # instead of NaN (jnp.linalg.norm at 0 has a NaN gradient).
        g = jax.grad(
            lambda z: ops.inner_correlation(z).sum()
        )(jnp.zeros((1, 4, 3)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestMiAuxLoss:
    """Reference: get_loss2, log/part_seg/res/pointnet2_part_seg_msg.py:182-227."""

    def test_matches_numpy_bce(self):
        from mpa_tpu import train as tr

        r = rng(5)
        rets = [r.normal(size=(3, 8)).astype(np.float32) for _ in range(3)]
        got = float(tr.mi_aux_loss(*[jnp.asarray(x) for x in rets]))

        def bce(x, t):
            return np.mean(
                np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))
            )

        t = np.concatenate([np.ones((3, 4)), np.zeros((3, 4))], axis=1)
        want = np.mean([bce(x, t) for x in rets])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_perfect_scores_drive_loss_down(self):
        from mpa_tpu import train as tr

        good = jnp.concatenate(
            [jnp.full((2, 4), 20.0), jnp.full((2, 4), -20.0)], axis=1
        )
        bad = -good
        assert float(tr.mi_aux_loss(good, good, good)) < 1e-6
        assert float(tr.mi_aux_loss(bad, bad, bad)) > 10.0
