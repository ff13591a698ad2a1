"""Tests for the optional extras (orphan re-designs), dead-code ops, and the
FP-decoder part-seg variant."""

import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpa_tpu import ops, geometry, train as tr  # noqa: E402
from mpa_tpu.extras import DGCNN, SpatialPyramidNetVLAD, Disp3DEncoder  # noqa: E402
from mpa_tpu.models import MarkovPartSegFP, list_models  # noqa: E402
from mpa_tpu.data.synthetic import synthetic_partseg  # noqa: E402
from mpa_tpu.data.shapenetpart import to_categorical  # noqa: E402
from jit_util import jit_init, jit_apply  # noqa: E402


def rng(seed=0):
    return np.random.default_rng(seed)


class TestDeadCodeOps:
    def test_knn_point2_detie_duplicates(self):
        pts = jnp.asarray(rng(0).normal(size=(1, 16, 3)).astype(np.float32))
        pts = pts.at[:, 1].set(pts[:, 0])  # coincident duplicate
        d, idx = ops.knn_point2(4, pts, jax.random.key(0))
        idx = np.asarray(idx)
        # self is still first; the coincident duplicate is NOT second.
        assert idx[0, 0, 0] == 0
        assert idx[0, 0, 1] != 1

    def test_mod_index(self):
        base = jnp.zeros((2, 5, 3))
        vals = jnp.ones((2, 2, 3))
        idx = jnp.array([[0, 4], [1, 2]])
        out = np.asarray(ops.mod_index(base, idx, vals))
        np.testing.assert_array_equal(out[0, [0, 4]], 1.0)
        np.testing.assert_array_equal(out[0, [1, 2, 3]], 0.0)
        np.testing.assert_array_equal(out[1, [1, 2]], 1.0)

    def test_shared_random_sample(self):
        pts = jnp.asarray(rng(1).normal(size=(3, 20, 3)).astype(np.float32))
        sampled, idx = ops.sampling.shared_random_sample(jax.random.key(0), pts, 8)
        assert sampled.shape == (3, 8, 3)
        # shared permutation: identical index rows across the batch
        np.testing.assert_array_equal(np.asarray(idx)[0], np.asarray(idx)[2])
        np.testing.assert_allclose(
            np.asarray(sampled)[1], np.asarray(pts)[1][np.asarray(idx)[1]]
        )

    def test_convert_polar_ranges(self):
        r = rng(2)
        neigh = jnp.asarray(r.normal(size=(2, 8, 4, 3)).astype(np.float32))
        centre = jnp.asarray(r.normal(size=(2, 8, 1, 3)).astype(np.float32))
        outs = geometry.convert_polar(neigh, centre)
        assert len(outs) == 6
        for o in outs:
            assert o.shape == (2, 8, 4)
            assert np.all(np.abs(np.asarray(o)) <= np.pi + 1e-6)

    def test_knn_surface_features(self):
        pts = jnp.asarray(rng(3).normal(size=(2, 32, 3)).astype(np.float32))
        normal, centre, pos = geometry.knn_surface_features(
            pts, pts, k=3, return_dist=True
        )
        assert normal.shape == (2, 32, 3) and pos.shape == (2, 32, 1)
        assert np.all(np.isfinite(np.asarray(normal)))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(normal), axis=-1), 1.0, atol=1e-4
        )


class TestExtras:
    def test_dgcnn_forward(self):
        model = DGCNN(num_classes=5, k=4, block_widths=(8, 8, 16, 16))
        x = jnp.asarray(rng(4).normal(size=(2, 32, 3)).astype(np.float32))
        variables = jit_init(model, {"params": jax.random.key(0)}, x, train=False)
        out = jit_apply(model, variables, x, train=False)
        assert out.shape == (2, 5)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dgcnn_registered(self):
        assert "dgcnn" in list_models()

    def test_netvlad(self):
        model = SpatialPyramidNetVLAD(output_dim=32, cluster_size=8)
        x = jnp.asarray(rng(5).normal(size=(2, 64, 16)).astype(np.float32))
        variables = jit_init(model, {"params": jax.random.key(0)}, x, train=False)
        out = jit_apply(model, variables, x, train=False)
        assert out.shape == (2, 32)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_disp3d_encoder(self):
        model = Disp3DEncoder(widths=(8, 16), support_num=2, k=4)
        x = jnp.asarray(rng(6).normal(size=(2, 32, 3)).astype(np.float32))
        variables = jit_init(model, {"params": jax.random.key(0)}, x, train=False)
        out = jit_apply(model, variables, x, train=False)
        assert out.shape == (2, 32, 16)
        assert np.all(np.isfinite(np.asarray(out)))


class TestPartSegFPVariant:
    @pytest.mark.slow
    def test_forward_and_training(self):
        model = MarkovPartSegFP(
            num_parts=8,
            num_categories=4,
            npoints=(32, 16, 8),
            channels=(16, 16, 16, 32),
            residuals=(False, False, False, True),
            num_neighbors=4,
        )
        pts, cats, segs = synthetic_partseg(8, num_points=64, num_categories=4, num_parts=8)
        batch = (jnp.asarray(pts), jnp.asarray(to_categorical(cats, 4)))
        tx = tr.make_optimizer("adam-l2", 1e-3)
        state = tr.create_train_state(model, jax.random.key(0), batch, tx)
        out = tr.make_eval_step()(state, batch)
        assert out.shape == (8, 64, 8)

        step = jax.jit(tr.make_train_step(tr.smooth_seg_loss))
        losses = []
        for _ in range(5):
            state, loss = step(state, batch, jnp.asarray(segs), jax.random.key(1))
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
