"""L1 geometry tests: unit checks + golden parity against the reference's
torch implementations (loaded via tests/ref_oracle.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import load_reference  # noqa: E402

from mpa_tpu import geometry, ops  # noqa: E402

REF = load_reference()


def rng(seed=0):
    return np.random.default_rng(seed)


class TestXyz2Sphere:
    def test_golden_parity(self):
        x = rng(0).normal(size=(2, 32, 3)).astype(np.float32)
        got = np.asarray(geometry.xyz2sphere(jnp.asarray(x)))
        want = REF["polar_utils"].xyz2sphere(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_zero_point_no_nan(self):
        x = jnp.zeros((1, 4, 3))
        out = np.asarray(geometry.xyz2sphere(x))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out[..., 1], 0.0)  # theta = 0 at rho = 0

    def test_group_shape(self):
        x = jnp.ones((2, 8, 5, 3))
        assert geometry.xyz2sphere(x).shape == (2, 8, 5, 3)


class TestXyz2Cylind:
    def test_golden_parity(self):
        x = rng(1).normal(size=(2, 16, 3)).astype(np.float32)
        got = np.asarray(geometry.xyz2cylind(jnp.asarray(x)))
        want = REF["polar_utils"].xyz2cylind(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestCalNormal:
    def test_golden_parity_group(self):
        tri = rng(2).normal(size=(2, 8, 4, 3, 3)).astype(np.float32)
        got = np.asarray(geometry.cal_normal(jnp.asarray(tri), is_group=True))
        want = (
            REF["recons_utils"]
            .cal_normal(torch.from_numpy(tri), random_inv=False, is_group=True)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_golden_parity_nongroup(self):
        tri = rng(3).normal(size=(2, 8, 3, 3)).astype(np.float32)
        got = np.asarray(geometry.cal_normal(jnp.asarray(tri), is_group=False))
        want = (
            REF["recons_utils"]
            .cal_normal(torch.from_numpy(tri), random_inv=False, is_group=False)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_unit_norm(self):
        tri = jnp.asarray(rng(4).normal(size=(1, 6, 3, 3)).astype(np.float32))
        n = np.asarray(geometry.cal_normal(tri))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)

    def test_random_inv_is_batchwise_sign(self):
        tri = jnp.asarray(rng(5).normal(size=(4, 6, 3, 3)).astype(np.float32))
        base = np.asarray(geometry.cal_normal(tri))
        inv = np.asarray(
            geometry.cal_normal(tri, random_inv_key=jax.random.key(0))
        )
        for b in range(4):
            ratio = inv[b] / base[b]
            assert np.allclose(ratio, 1.0, atol=1e-5) or np.allclose(
                ratio, -1.0, atol=1e-5
            )


class TestCalCenterConstArea:
    def test_center_golden(self):
        tri = rng(6).normal(size=(2, 8, 4, 3, 3)).astype(np.float32)
        got = np.asarray(geometry.cal_center(jnp.asarray(tri)))
        want = REF["recons_utils"].cal_center(torch.from_numpy(tri)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_const_golden(self):
        r = rng(7)
        n = r.normal(size=(2, 8, 3)).astype(np.float32)
        c = r.normal(size=(2, 8, 3)).astype(np.float32)
        got = np.asarray(geometry.cal_const(jnp.asarray(n), jnp.asarray(c)))
        want = (
            REF["recons_utils"]
            .cal_const(torch.from_numpy(n), torch.from_numpy(c))
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_area_golden(self):
        tri = rng(8).normal(size=(2, 6, 3, 3)).astype(np.float32)
        got = np.asarray(geometry.cal_area(jnp.asarray(tri)))
        want = REF["recons_utils"].cal_area(torch.from_numpy(tri)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestCheckNanUmbrella:
    def test_golden_parity(self):
        r = rng(9)
        B, N, G = 2, 6, 4
        normal = r.normal(size=(B, N, G, 3)).astype(np.float32)
        center = r.normal(size=(B, N, G, 3)).astype(np.float32)
        pos = r.normal(size=(B, N, G, 1)).astype(np.float32)
        # Poison some fans (keep fan 1 valid so repair has a source).
        normal[0, 2, 0] = np.nan
        normal[1, 4, 2] = np.nan
        normal[1, 4, 3] = np.nan
        gn, gc, gp = geometry.check_nan_umbrella(
            jnp.asarray(normal), jnp.asarray(center), jnp.asarray(pos)
        )
        wn, wc, wp = REF["recons_utils"].check_nan_umb(
            torch.from_numpy(normal.copy()),
            torch.from_numpy(center.copy()),
            torch.from_numpy(pos.copy()),
        )
        np.testing.assert_allclose(np.asarray(gn), wn.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gc), wc.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp), wp.numpy(), atol=1e-6)

    def test_all_finite_after_repair(self):
        normal = np.ones((1, 3, 4, 3), np.float32)
        normal[0, 1, 0] = np.nan
        center = np.ones((1, 3, 4, 3), np.float32)
        gn, _ = geometry.check_nan_umbrella(jnp.asarray(normal), jnp.asarray(center))
        assert np.all(np.isfinite(np.asarray(gn)))


class TestGroupByUmbrella:
    def test_golden_parity(self):
        x = rng(10).normal(size=(2, 24, 3)).astype(np.float32)
        got = np.asarray(geometry.group_by_umbrella(jnp.asarray(x), jnp.asarray(x), k=7))
        want = (
            REF["pointnet2_utils"]
            .group_by_umbrella(torch.from_numpy(x), torch.from_numpy(x), k=7)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_triangle_structure(self):
        x = jnp.asarray(rng(11).normal(size=(1, 16, 3)).astype(np.float32))
        fans = np.asarray(geometry.group_by_umbrella(x, x, k=5))
        assert fans.shape == (1, 16, 4, 3, 3)
        np.testing.assert_array_equal(fans[..., 0, :], 0.0)  # point 0 = centre
        # Rolled successor: triangle g's point 2 == triangle (g+1)%G's point 1.
        np.testing.assert_allclose(
            fans[0, :, :, 2, :], np.roll(fans[0, :, :, 1, :], -1, axis=1), atol=1e-6
        )


class TestPca:
    def test_components_orthonormal(self):
        x = jnp.asarray(rng(12).normal(size=(20, 5)).astype(np.float32))
        out = geometry.pca(x, 3)
        comp = np.asarray(out["components"])  # [5, 3]
        np.testing.assert_allclose(comp.T @ comp, np.eye(3), atol=1e-4)


class TestUmbrellaFeaturePipeline:
    def test_full_repsurf_feature_stack(self):
        """End-to-end: umbrella -> normal/center/polar/const -> finite [B,N,G,10]."""
        x = jnp.asarray(rng(13).normal(size=(2, 32, 3)).astype(np.float32))
        fans = geometry.group_by_umbrella(x, x, k=9)
        normal = geometry.cal_normal(fans, is_group=True)
        center = geometry.cal_center(fans)
        polar = geometry.xyz2sphere(center)
        pos = geometry.cal_const(normal, center)
        normal, center, pos = geometry.check_nan_umbrella(normal, center, pos)
        feat = jnp.concatenate([center, polar, normal, pos], axis=-1)
        assert feat.shape == (2, 32, 8, 10)
        assert np.all(np.isfinite(np.asarray(feat)))
