"""Golden parity for the part-seg blocks: the 3-branch LocalMerge
(modules/pointnet2_utils.py:427-477) and a Fuse step
(modules/pointnet2_utils.py:576-709) with transplanted weights.

Torch side frozen into tests/fixtures/partseg_localmerge.npz and
partseg_fuse_t{0,2,4}.npz (builders in tests/torch_side/blocks.py; the Fuse
fixtures also freeze the FPS-chain / encoder-kNN inputs so both frameworks
are compared on identical indices). Regenerate with MPA_REGEN_ORACLES=1."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_cache import oracle, subtree  # noqa: E402

from mpa_tpu.nn import LocalMerge, Fuse  # noqa: E402


class TestPartSegLocalMergeParity:
    def test_three_branch_transition(self):
        def build():
            from torch_side.blocks import partseg_localmerge_fixture
            return partseg_localmerge_fixture()

        f = oracle("partseg_localmerge", build)
        got, _, _ = LocalMerge(128, 8, residual=True, include_xyz_branch=True).apply(
            subtree(f, "variables"),
            jnp.asarray(f["xyz"]),
            jnp.asarray(f["base_xyz"]),
            feature=jnp.asarray(f["feature"]),
            fps_idx=jnp.asarray(f["fps_idx"]),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=3e-5)


class TestFuseParity:
    CH = (64, 64, 64, 128, 256)

    def _compare_target(self, t):
        def build():
            from torch_side.blocks import fuse_fixture
            return fuse_fixture(t)

        f = oracle(f"partseg_fuse_t{t}", build)
        feats = [jnp.asarray(subtree(f, "feats")[str(i)]) for i in range(5)]
        fps = [jnp.asarray(subtree(f, "fps")[str(i)]) for i in range(4)]
        knn_idx = [None] + [
            jnp.asarray(subtree(f, "knn_idx")[str(i)]) for i in range(4)
        ]
        xyz = [jnp.asarray(subtree(f, "xyz")[str(i)]) for i in range(5)]

        got = Fuse(self.CH, num_neighbors=8).apply(
            subtree(f, "variables"), t, feats, fps, knn_idx, xyz, train=False
        )[t]
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=5e-5)

    def test_target_coarsest(self):  # only finer->coarser FPS chains
        self._compare_target(4)

    def test_target_middle(self):  # mix of chains and upsamples
        self._compare_target(2)

    def test_target_finest(self):  # only coarser->finer upsamples
        self._compare_target(0)
