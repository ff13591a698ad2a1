"""Round-2 parity/robustness fixes: with-normal augmentations, --init
weight re-initialization (ZerO vs the torch oracle), crash-safe checkpointing,
native_io truncation guard."""

import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpa_tpu.data import augment  # noqa: E402
from mpa_tpu.utils.init import apply_weight_init, zero_init_dense  # noqa: E402


class TestWithNormalAugment:
    def _cloud(self, seed=0, B=3, N=32):
        r = np.random.default_rng(seed)
        xyz = r.normal(size=(B, N, 3)).astype(np.float32)
        nrm = r.normal(size=(B, N, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        return jnp.asarray(np.concatenate([xyz, nrm], -1))

    def test_rotate_y_with_normal_is_rigid(self):
        """Same per-cloud rotation on xyz and normals: norms and xyz·normal
        angles are preserved (ref tool/provider.py:86-105)."""
        pts = self._cloud()
        out = augment.random_rotate_y_with_normal(jax.random.key(3), pts)
        x0, n0 = np.asarray(pts[..., :3]), np.asarray(pts[..., 3:])
        x1, n1 = np.asarray(out[..., :3]), np.asarray(out[..., 3:])
        np.testing.assert_allclose(
            np.linalg.norm(x1, axis=-1), np.linalg.norm(x0, axis=-1), atol=1e-5
        )
        np.testing.assert_allclose(np.sum(x1 * n1, -1), np.sum(x0 * n0, -1), atol=1e-5)
        # y (up) coordinate untouched by an up-axis rotation
        np.testing.assert_allclose(x1[..., 1], x0[..., 1], atol=1e-6)
        assert not np.allclose(x1, x0)

    def test_rotate_y_with_normal_matches_xyz_only(self):
        """The xyz channels follow the same draw as random_rotate_y."""
        pts = self._cloud(1)
        key = jax.random.key(11)
        out = augment.random_rotate_y_with_normal(key, pts)
        xyz_only = augment.random_rotate_y(key, pts[..., :3])
        np.testing.assert_allclose(
            np.asarray(out[..., :3]), np.asarray(xyz_only), atol=1e-6
        )

    def test_perturb_with_normal_is_rigid(self):
        pts = self._cloud(2)
        out = augment.random_rotate_perturb_with_normal(jax.random.key(5), pts)
        x0, n0 = np.asarray(pts[..., :3]), np.asarray(pts[..., 3:])
        x1, n1 = np.asarray(out[..., :3]), np.asarray(out[..., 3:])
        np.testing.assert_allclose(
            np.linalg.norm(n1, axis=-1), np.ones(n1.shape[:-1]), atol=1e-5
        )
        np.testing.assert_allclose(np.sum(x1 * n1, -1), np.sum(x0 * n0, -1), atol=1e-5)
        # Perturbations are small: rotation stays near identity.
        assert np.max(np.linalg.norm(x1 - x0, axis=-1)) < np.max(np.linalg.norm(x0, axis=-1))

    def test_rotate_by_angle_against_numpy(self):
        """Deterministic up-axis rotation matches the reference formula
        (tool/provider.py:135-151: rotated = pc @ [[c,0,s],[0,1,0],[-s,0,c]])."""
        pts = self._cloud(4)
        angle = 0.7
        out = np.asarray(augment.rotate_by_angle(pts, angle))
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        want_xyz = np.asarray(pts[..., :3]) @ rot
        want_nrm = np.asarray(pts[..., 3:]) @ rot
        np.testing.assert_allclose(out[..., :3], want_xyz, atol=1e-5)
        np.testing.assert_allclose(out[..., 3:], want_nrm, atol=1e-5)

    def test_rotate_by_angle_xyz_only_shape(self):
        pts = self._cloud(5)[..., :3]
        out = augment.rotate_by_angle(pts, jnp.zeros(()))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def _torch_zero_init(m, n):
    """Reference ZerO_Init_on_matrix (util/utils.py:28-42) on an [m, n] torch
    weight."""
    from scipy.linalg import hadamard

    if m <= n:
        return torch.nn.init.eye_(torch.empty(m, n))
    clog_m = math.ceil(math.log2(m))
    p = 2**clog_m
    return (
        torch.nn.init.eye_(torch.empty(m, p))
        @ (torch.tensor(hadamard(p)).float() / (2 ** (clog_m / 2)))
        @ torch.nn.init.eye_(torch.empty(p, n))
    )


class TestWeightInit:
    @pytest.mark.parametrize("in_dim,out_dim", [(64, 64), (128, 64), (64, 128), (3, 50), (50, 3)])
    def test_zero_matches_torch_oracle(self, in_dim, out_dim):
        """flax kernel [in, out] == torch ZerO weight [out, in] transposed."""
        got = np.asarray(zero_init_dense(jax.random.key(0), (in_dim, out_dim)))
        want = _torch_zero_init(out_dim, in_dim).numpy().T
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_apply_weight_init_tree(self):
        params = {
            "fc1": {"kernel": jnp.ones((8, 16)), "bias": jnp.ones((16,))},
            "bn1": {"scale": jnp.full((16,), 2.0), "bias": jnp.full((16,), 3.0)},
            "fc2": {"kernel": jnp.ones((16, 4)), "bias": jnp.ones((4,))},
        }
        out = apply_weight_init(params, "zero", jax.random.key(0))
        np.testing.assert_allclose(np.asarray(out["bn1"]["scale"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["bn1"]["bias"]), 0.0)
        np.testing.assert_allclose(np.asarray(out["fc1"]["bias"]), 0.0)
        np.testing.assert_allclose(
            np.asarray(out["fc2"]["kernel"]), _torch_zero_init(4, 16).numpy().T, atol=1e-6
        )
        for kind in ("xavier", "kaiming"):
            out = apply_weight_init(params, kind, jax.random.key(1))
            k = np.asarray(out["fc1"]["kernel"])
            assert k.std() > 0 and not np.allclose(k, 1.0)
        with pytest.raises(ValueError):
            apply_weight_init(params, "bogus", jax.random.key(0))


class TestCrashSafeCheckpoint:
    def _mk(self, tmp_path):
        from flax.training import train_state
        import optax
        import flax.linen as fnn

        model = fnn.Dense(2)
        params = model.init(jax.random.key(0), jnp.ones((1, 3)))["params"]
        return train_state.TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.sgd(0.1)
        )

    def test_save_swaps_atomically(self, tmp_path):
        from mpa_tpu.train.checkpoint import BestCheckpointer

        state = self._mk(tmp_path)
        ck = BestCheckpointer(str(tmp_path))
        assert ck.save_if_best(state, 0.5)
        assert ck.save_if_best(state.replace(step=7), 0.9)
        assert not ck.save_if_best(state, 0.1)
        d = os.listdir(tmp_path)
        assert "best" in d and "best.new" not in d and "best.old" not in d
        restored, metric = ck.restore(state)
        assert metric == pytest.approx(0.9)
        assert int(restored.step) == 7

    def test_restore_recovers_from_mid_swap_crash(self, tmp_path):
        from mpa_tpu.train.checkpoint import BestCheckpointer

        state = self._mk(tmp_path)
        ck = BestCheckpointer(str(tmp_path))
        ck.save_if_best(state.replace(step=3), 0.4)
        # Simulate a crash after the old ckpt was moved aside but before the
        # new one was renamed into place.
        os.rename(os.path.join(tmp_path, "best"), os.path.join(tmp_path, "best.new"))
        ck2 = BestCheckpointer(str(tmp_path))
        restored, metric = ck2.restore(state)
        assert int(restored.step) == 3 and metric == pytest.approx(0.4)


class TestNativeIOTruncationGuard:
    def test_loadtxt_refuses_truncation(self, tmp_path):
        from mpa_tpu.data import native_io

        p = tmp_path / "pts.txt"
        rows = ["0.1 0.2 0.3" for _ in range(10)]
        p.write_text("\n".join(rows) + "\n")
        out = native_io.loadtxt(str(p), 3, max_rows=64)
        assert out.shape == (10, 3)
        if native_io.native_available():
            with pytest.raises(ValueError):
                native_io.loadtxt(str(p), 3, max_rows=10)


class TestCanonicalPoseClouds:
    """realistic_clouds(canonical_pose=True) must keep same-class clouds in
    one shared frame — the identifiability precondition for the pose task
    (cli/train.py _pose_arrays): a z-rotation target stacked on an unknown
    uniform base rotation is unlearnable (90-deg mean-error floor)."""

    @staticmethod
    def _xy_angles(pts, labels, cls):
        """Per-cloud orientation proxy: principal-axis angle of the xy
        second-moment matrix (defined mod pi)."""
        out = []
        for p in pts[labels == cls]:
            m = p[:, :2].T @ p[:, :2] / len(p)
            out.append(0.5 * math.atan2(2 * m[0, 1], m[0, 0] - m[1, 1]))
        return np.asarray(out)

    def _spread(self, canonical_pose, seed):
        from mpa_tpu.data import realistic_clouds

        pts, labels = realistic_clouds(
            48, 2048, num_classes=4, seed=seed, canonical_pose=canonical_pose
        )
        spreads = []
        for c in range(4):
            a = self._xy_angles(pts, labels, c)
            if len(a) < 4:
                continue
            # circular spread of the mod-pi angle: 1 - |mean(exp(2i*a))|
            spreads.append(1.0 - abs(np.mean(np.exp(2j * a))))
        # median over classes: the angle proxy is ill-conditioned for a
        # class whose xy moments happen to be near-isotropic
        return float(np.median(spreads))

    def test_canonical_clouds_share_a_frame(self):
        assert self._spread(True, seed=7) < 0.02

    def test_default_clouds_are_randomly_rotated(self):
        assert self._spread(False, seed=7) > 0.3

    def test_canonical_flag_preserves_rng_stream(self):
        """Only the rotation differs: per-point primitive sampling, scale,
        and jitter draws stay aligned, so z-extents match (a z-rotation
        never moves the z-coordinate) up to the radius renormalization."""
        from mpa_tpu.data import realistic_clouds

        a, la = realistic_clouds(8, 128, num_classes=2, seed=3)
        b, lb = realistic_clouds(8, 128, num_classes=2, seed=3, canonical_pose=True)
        np.testing.assert_array_equal(la, lb)
        za = a[..., 2] - a[..., 2].mean(axis=1, keepdims=True)
        zb = b[..., 2] - b[..., 2].mean(axis=1, keepdims=True)
        # normalize out the per-cloud unit-radius scale before comparing
        za /= np.abs(za).max(axis=1, keepdims=True)
        zb /= np.abs(zb).max(axis=1, keepdims=True)
        np.testing.assert_allclose(za, zb, atol=1e-4)
