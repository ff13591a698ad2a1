"""Golden parity for the part-seg blocks: the 3-branch LocalMerge
(modules/pointnet2_utils.py:427-477) and a Fuse step
(modules/pointnet2_utils.py:576-709) with transplanted weights."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import load_reference, _farthest_point_sample  # noqa: E402
import test_nn_blocks as H  # noqa: E402

from mpa_tpu import ops  # noqa: E402
from mpa_tpu.nn import LocalMerge, Fuse  # noqa: E402

REF = load_reference()


def rng(seed=0):
    return np.random.default_rng(seed)


class TestPartSegLocalMergeParity:
    def _vars(self, ref_lm, residual):
        params, stats = {}, {}
        params["xyz_trans"], stats["xyz_trans"] = H.localtrans_vars(ref_lm.xyz_Trans, True)
        params["feature_trans"], stats["feature_trans"] = H.localtrans_vars(
            ref_lm.feature_Trans1, residual
        )
        params["feature_trans2"], stats["feature_trans2"] = H.localtrans_vars(
            ref_lm.feature_Trans2, residual
        )
        params["fc2"], stats["fc2"] = H.linear_unit_vars(ref_lm.fc2)
        return {"params": params, "batch_stats": stats}

    def test_three_branch_transition(self):
        torch.manual_seed(21)
        ref = (
            REF["pointnet2_utils"]
            .LocalMerge(64, 128, 8, usetanh=False, residual=True)
            .eval()
        )
        variables = self._vars(ref, True)

        r = rng(0)
        B, N, S = 2, 64, 32
        base_xyz = r.normal(size=(B, N, 3)).astype(np.float32)
        feature = r.normal(size=(B, N, 64)).astype(np.float32)
        fps_idx = np.stack([r.permutation(N)[:S] for _ in range(B)]).astype(np.int64)
        xyz = np.take_along_axis(base_xyz, fps_idx[..., None], 1)

        with torch.no_grad():
            want = ref(
                xyz=torch.from_numpy(xyz),
                base_xyz=torch.from_numpy(base_xyz),
                normal=torch.from_numpy(base_xyz),
                feature=torch.from_numpy(feature),
                FPS_idx=torch.from_numpy(fps_idx),
            )[0].numpy()

        got, _, _ = LocalMerge(128, 8, residual=True, include_xyz_branch=True).apply(
            variables,
            jnp.asarray(xyz),
            jnp.asarray(base_xyz),
            feature=jnp.asarray(feature),
            fps_idx=jnp.asarray(fps_idx),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


class TestFuseParity:
    def _transplant_target(self, ref_fuse, t, channels):
        """Map the reference Fuse's conv{s}{t} row + conv{t} for target t."""
        params, stats = {}, {}
        for s in range(5):
            if s == t:
                continue
            name = f"conv{s}{t}"
            p, st = H.linear_unit_vars(getattr(ref_fuse, name))
            params[name], stats[name] = p, st
        p, st = H.linear_unit_vars(getattr(ref_fuse, f"conv{t}"))
        params[f"conv{t}"], stats[f"conv{t}"] = p, st
        return {"params": params, "batch_stats": stats}

    def _setup_states(self, seed=1):
        """Build a 5-scale pyramid with real FPS chains and encoder kNN."""
        r = rng(seed)
        B = 2
        sizes = (128, 64, 32, 16, 8)
        ch = (64, 64, 64, 128, 256)
        xyz = [jnp.asarray(r.normal(size=(B, sizes[0], 3)).astype(np.float32))]
        fps, knn_idx = [], [None]
        for j, n in enumerate(sizes[1:]):
            fi = ops.farthest_point_sample(xyz[j], n)
            xyz.append(ops.index_points(xyz[j], fi))
            fps.append(fi)
            _, ki = ops.knn(8, xyz[j], xyz[j + 1])
            knn_idx.append(ki)
        feats = [
            jnp.asarray(r.normal(size=(B, n, c)).astype(np.float32))
            for n, c in zip(sizes, ch)
        ]
        return ch, feats, fps, knn_idx, xyz

    def _ref_forward(self, ref_fuse, t, feats, fps, knn_idx, xyz):
        """Drive the reference Fuse at the num_point that selects target t."""
        tt = [torch.from_numpy(np.asarray(f)) for f in feats]
        tf = [torch.from_numpy(np.asarray(i)) for i in fps]
        tk = [None] + [torch.from_numpy(np.asarray(i)) for i in knn_idx[1:]]
        tx = [torch.from_numpy(np.asarray(x)) for x in xyz]
        num_point = {4: 128, 3: 256, 2: 512, 1: 1024, 0: 2048}[t]
        with torch.no_grad():
            out = ref_fuse(
                num_point,
                f0=tt[0], f1=tt[1], f2=tt[2], f3=tt[3], f4=tt[4],
                FPS_0=tf[0], FPS_1=tf[1], FPS_2=tf[2], FPS_3=tf[3],
                knn_0=tk[0], knn_1=tk[1], knn_2=tk[2], knn_3=tk[3], knn_4=tk[4],
                xyz0=tx[0], xyz1=tx[1], xyz2=tx[2], xyz3=tx[3], xyz4=tx[4],
            )
        return out[t].numpy()

    def _compare_target(self, t):
        torch.manual_seed(31 + t)
        ch, feats, fps, knn_idx, xyz = self._setup_states(seed=t)
        ref_fuse = REF["pointnet2_utils"].Fuse(*ch).eval()
        variables = self._transplant_target(ref_fuse, t, ch)
        # Reference upsample is CUDA-only (torch.cuda.FloatTensor); patch a CPU
        # equivalent into the oracle module.
        ref_mod = REF["pointnet2_utils"]
        orig_upsample = ref_mod.upsample

        def cpu_upsample(points, knn_idx_, scale_ratio=2, dist=None):
            B, S, C = points.shape
            K = knn_idx_.shape[-1]
            points1 = points.unsqueeze(-2).repeat(1, 1, K, 1)
            big = torch.zeros(B, S, S * scale_ratio, C)
            out = big.scatter_(
                -2, knn_idx_.unsqueeze(-1).repeat(1, 1, 1, C).long(), points1
            )
            total = torch.sum(out, dim=1)
            nz = torch.count_nonzero(out[:, :, :, 0], dim=1).unsqueeze(-1).float()
            nz = torch.where(nz == 0.0, torch.ones_like(nz), nz)
            return total / nz

        ref_mod.upsample = cpu_upsample
        try:
            want = self._ref_forward(ref_fuse, t, feats, fps, knn_idx, xyz)
        finally:
            ref_mod.upsample = orig_upsample

        got = Fuse(ch, num_neighbors=8).apply(
            variables, t, list(feats), fps, knn_idx, xyz, train=False
        )[t]
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)

    def test_target_coarsest(self):  # only finer->coarser FPS chains
        self._compare_target(4)

    def test_target_middle(self):  # mix of chains and upsamples
        self._compare_target(2)

    def test_target_finest(self):  # only coarser->finer upsamples
        self._compare_target(0)
