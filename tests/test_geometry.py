"""L1 geometry tests: unit checks + golden parity against the reference's
torch implementations, frozen as npz fixtures (tests/fixtures/geometry.npz;
regenerate against /root/reference with MPA_REGEN_ORACLES=1 — see
tests/torch_side/geometry.py for the oracle builder)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_cache import oracle  # noqa: E402

from mpa_tpu import geometry  # noqa: E402


def _builder():
    from torch_side.geometry import geometry_fixture
    return geometry_fixture()


def fx():
    return oracle("geometry", _builder)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestXyz2Sphere:
    def test_golden_parity(self):
        f = fx()
        got = np.asarray(geometry.xyz2sphere(jnp.asarray(f["sphere/x"])))
        np.testing.assert_allclose(got, f["sphere/want"], atol=1e-5)

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
        f = fx()
        got = np.asarray(geometry.xyz2cylind(jnp.asarray(f["cylind/x"])))
        np.testing.assert_allclose(got, f["cylind/want"], atol=1e-5)


class TestCalNormal:
    def test_golden_parity_group(self):
        f = fx()
        got = np.asarray(
            geometry.cal_normal(jnp.asarray(f["normal_group/tri"]), is_group=True)
        )
        np.testing.assert_allclose(got, f["normal_group/want"], atol=1e-5)

    def test_golden_parity_nongroup(self):
        f = fx()
        got = np.asarray(
            geometry.cal_normal(jnp.asarray(f["normal_nongroup/tri"]), is_group=False)
        )
        np.testing.assert_allclose(got, f["normal_nongroup/want"], atol=1e-5)

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
        f = fx()
        got = np.asarray(geometry.cal_center(jnp.asarray(f["center/tri"])))
        np.testing.assert_allclose(got, f["center/want"], atol=1e-6)

    def test_const_golden(self):
        f = fx()
        got = np.asarray(
            geometry.cal_const(jnp.asarray(f["const/n"]), jnp.asarray(f["const/c"]))
        )
        np.testing.assert_allclose(got, f["const/want"], atol=1e-6)

    def test_area_golden(self):
        f = fx()
        got = np.asarray(geometry.cal_area(jnp.asarray(f["area/tri"])))
        np.testing.assert_allclose(got, f["area/want"], atol=1e-4)


class TestCheckNanUmbrella:
    def test_golden_parity(self):
        f = fx()
        gn, gc, gp = geometry.check_nan_umbrella(
            jnp.asarray(f["nan_umb/normal"]),
            jnp.asarray(f["nan_umb/center"]),
            jnp.asarray(f["nan_umb/pos"]),
        )
        np.testing.assert_allclose(np.asarray(gn), f["nan_umb/want_normal"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(gc), f["nan_umb/want_center"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp), f["nan_umb/want_pos"], atol=1e-6)

    def test_all_finite_after_repair(self):
        normal = np.ones((1, 3, 4, 3), np.float32)
        normal[0, 1, 0] = np.nan
        center = np.ones((1, 3, 4, 3), np.float32)
        gn, _ = geometry.check_nan_umbrella(jnp.asarray(normal), jnp.asarray(center))
        assert np.all(np.isfinite(np.asarray(gn)))


class TestGroupByUmbrella:
    def test_golden_parity(self):
        f = fx()
        x = jnp.asarray(f["umbrella/x"])
        got = np.asarray(geometry.group_by_umbrella(x, x, k=7))
        np.testing.assert_allclose(got, f["umbrella/want"], atol=1e-5)

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
