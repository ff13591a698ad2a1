"""Part-segmentation stack tests: fps-chain composition, Fuse structure,
feature propagation parity, full model forward, and training smoke with the
exact IoU protocol."""

import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_cache import oracle, subtree  # noqa: E402
from jit_util import jit_init, jit_apply  # noqa: E402

from mpa_tpu import ops, train as tr  # noqa: E402
from mpa_tpu.nn import Fuse, compose_fps_chain, PointNetFeaturePropagation  # noqa: E402
from mpa_tpu.models import MarkovPartSeg  # noqa: E402
from mpa_tpu.data.synthetic import synthetic_partseg  # noqa: E402
from mpa_tpu.data.shapenetpart import to_categorical, SEG_PARTS  # noqa: E402

def rng(seed=0):
    return np.random.default_rng(seed)


class TestComposeFpsChain:
    def test_matches_reference_composition(self):
        """idx04 = FPS_0[FPS_1[FPS_2[FPS_3]]] (modules/pointnet2_utils.py:617-619)."""
        r = rng(0)
        B = 2
        sizes = [64, 32, 16, 8, 4]
        fps = [
            jnp.asarray(
                np.stack([r.permutation(sizes[j])[: sizes[j + 1]] for _ in range(B)])
            )
            for j in range(4)
        ]
        got = np.asarray(compose_fps_chain(fps, 0, 4))
        want = np.asarray(fps[0])
        # chain down: scale-4 indices through fps3, fps2, fps1 into scale 0
        idx = np.asarray(fps[3])
        for j in (2, 1, 0):
            idx = np.take_along_axis(np.asarray(fps[j]), idx, axis=1)
        np.testing.assert_array_equal(got, idx)
        # adjacent chain is the FPS itself
        np.testing.assert_array_equal(
            np.asarray(compose_fps_chain(fps, 3, 4)), np.asarray(fps[3])
        )

    def test_chain_selects_consistent_points(self):
        """Gathering positions down the chain == the coarse positions."""
        r = rng(1)
        B, N = 2, 64
        xyz0 = jnp.asarray(r.normal(size=(B, N, 3)).astype(np.float32))
        fps, xyzs = [], [xyz0]
        cur = xyz0
        for n in (32, 16, 8):
            fi = ops.farthest_point_sample(cur, n)
            cur = ops.index_points(cur, fi)
            fps.append(fi)
            xyzs.append(cur)
        chained = ops.index_points(xyz0, compose_fps_chain(fps, 0, 3))
        np.testing.assert_allclose(np.asarray(chained), np.asarray(xyzs[3]), atol=0)


class TestUpsampleGoldenParity:
    def test_matches_reference_upsample(self):
        """Frozen CPU-adapted oracle of modules/pointnet2_utils.py:13-50 (the
        torch.cuda.FloatTensor is the only CUDA-ism; semantics unchanged).
        Builder: torch_side.blocks.upsample_fixture."""
        def build():
            from torch_side.blocks import upsample_fixture
            return upsample_fixture()

        f = oracle("partseg_upsample", build)
        got = np.asarray(
            ops.scatter_mean_upsample(
                jnp.asarray(f["feats"]), jnp.asarray(f["idx"]), int(f["n_out"])
            )
        )
        np.testing.assert_allclose(got, f["want"], atol=1e-5)


class TestFuse:
    def _setup(self):
        r = rng(3)
        B = 2
        sizes = (64, 32, 16, 8, 4)
        ch = (8, 8, 8, 16, 32)
        xyz = [jnp.asarray(r.normal(size=(B, n, 3)).astype(np.float32)) for n in sizes]
        feats = [
            jnp.asarray(r.normal(size=(B, n, c)).astype(np.float32))
            for n, c in zip(sizes, ch)
        ]
        fps, knn_idx = [], [None]
        cur = xyz[0]
        for j, n in enumerate(sizes[1:]):
            fi = ops.farthest_point_sample(cur, n)
            nxt = ops.index_points(cur, fi)
            fps.append(fi)
            _, ki = ops.knn(4, cur, nxt)
            knn_idx.append(ki)
            cur = nxt
        return ch, feats, fps, knn_idx, xyz

    # Default tier checks the two extreme target scales (finest: all coarser
    # sources upsampled in; coarsest: all finer sources FPS-chained down);
    # the middle scales compile near-identical graphs and run in the slow
    # tier (VERDICT r3 item 5: each scale costs ~6 s of CPU compile).
    @pytest.mark.parametrize(
        "t", [0, pytest.param(1, marks=pytest.mark.slow),
              pytest.param(2, marks=pytest.mark.slow),
              pytest.param(3, marks=pytest.mark.slow), 4]
    )
    def test_each_target_scale(self, t):
        ch, feats, fps, knn_idx, xyz = self._setup()
        fuse = Fuse(ch, num_neighbors=4)
        variables = fuse.init(
            jax.random.key(t), t, feats, fps, knn_idx, xyz, train=False
        )
        out = fuse.apply(variables, t, feats, fps, knn_idx, xyz, train=False)
        assert len(out) == 5
        for s in range(5):
            assert out[s].shape == feats[s].shape
            if s != t:  # non-targets pass through untouched
                np.testing.assert_array_equal(
                    np.asarray(out[s]), np.asarray(feats[s])
                )
        assert np.all(np.isfinite(np.asarray(out[t])))


class TestFeaturePropagationParity:
    def test_idw_parity(self):
        def build():
            from torch_side.blocks import feature_propagation_fixture
            return feature_propagation_fixture()

        f = oracle("partseg_feature_propagation", build)
        fp = PointNetFeaturePropagation(16, act=False)
        got = fp.apply(
            subtree(f, "variables"),
            jnp.asarray(f["xyz1"]),
            jnp.asarray(f["xyz2"]),
            jnp.asarray(f["p2"]),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=2e-5)


def tiny_partseg(num_parts=8, num_categories=4):
    return MarkovPartSeg(
        num_parts=num_parts,
        num_categories=num_categories,
        npoints=(32, 16, 8, 4),
        channels=(16, 16, 16, 32, 64),
        residuals=(True, False, False, True, True),
        num_neighbors=4,
    )


class TestMarkovPartSeg:
    def test_forward_shapes(self):
        model = tiny_partseg()
        pts, cats, _ = synthetic_partseg(4, num_points=64, num_categories=4, num_parts=8)
        onehot = to_categorical(cats, 4)
        variables = jit_init(
            model,
            {"params": jax.random.key(0)},
            (jnp.asarray(pts), jnp.asarray(onehot)),
            train=False,
        )
        out = jit_apply(
            model, variables, (jnp.asarray(pts), jnp.asarray(onehot)), train=False
        )
        assert out.shape == (4, 64, 8)
        probs = np.exp(np.asarray(out))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

    @pytest.mark.slow
    def test_training_reduces_loss(self):
        model = tiny_partseg()
        pts, cats, segs = synthetic_partseg(
            16, num_points=64, num_categories=4, num_parts=8
        )
        onehot = to_categorical(cats, 4)
        batch = (jnp.asarray(pts), jnp.asarray(onehot))
        labels = jnp.asarray(segs)

        tx = tr.make_optimizer("adam-l2", 1e-3)
        state = tr.create_train_state(model, jax.random.key(0), batch, tx)

        def loss_fn(out, labels):
            return tr.smooth_seg_loss(out, labels)

        def step_fn(state, inputs, labels, rng):
            return tr.make_train_step(loss_fn)(state, inputs, labels, rng)

        step = jax.jit(step_fn)
        rng_key = jax.random.key(1)
        losses = []
        for _ in range(6):
            state, loss = step(state, batch, labels, rng_key)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_iou_protocol_integration(self):
        """End-to-end: predictions -> category-masked argmax -> IoU numbers."""
        model = tiny_partseg(num_parts=50, num_categories=16)
        pts, cats, segs = synthetic_partseg(
            4, num_points=64, num_categories=16, num_parts=50
        )
        onehot = to_categorical(cats, 16)
        variables = jit_init(
            model,
            {"params": jax.random.key(0)},
            (jnp.asarray(pts), jnp.asarray(onehot)),
            train=False,
        )
        logp = np.asarray(
            jit_apply(
                model, variables, (jnp.asarray(pts), jnp.asarray(onehot)), train=False
            )
        )
        pred = tr.metrics.category_masked_argmax(logp, cats, SEG_PARTS)
        # masked argmax must stay inside the category's parts
        for b in range(4):
            assert set(np.unique(pred[b])) <= set(SEG_PARTS[cats[b]])
        ins, cls, cat_map = tr.part_iou_metrics(
            list(pred), list(segs), list(cats), SEG_PARTS
        )
        assert 0.0 <= ins <= 1.0 and 0.0 <= cls <= 1.0
