"""L2 block tests: golden parity against the reference torch modules with
transplanted weights (eval mode on both sides, randomized BN affines/stats so
the normalization path is genuinely exercised), plus shape/finiteness checks.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import load_reference  # noqa: E402

from mpa_tpu.nn import (  # noqa: E402
    LinearUnit,
    LocalTrans,
    LocalMerge,
    UmbrellaSurfaceConstructor,
    KeepHighResolutionEncoder,
)

REF = load_reference()
torch.manual_seed(0)


def t2j(t):
    # .copy(): on CPU jax can alias the numpy view zero-copy, and torch's
    # in-place optimizer updates would then silently mutate the "transplanted"
    # jax arrays (bit us in the training-equivalence test).
    return jnp.asarray(t.detach().numpy().copy())


def randomize_bn_(bn):
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_(0, 0.3)
        bn.running_mean.normal_(0, 0.2)
        bn.running_var.uniform_(0.5, 1.5)


def dense_params(tl):
    return {"kernel": t2j(tl.weight).T, "bias": t2j(tl.bias)}


def linear_unit_vars(ref_lin):
    """Map the reference `Linear` block (Dense+LN/BN+LReLU) to LinearUnit vars."""
    params = {"linear": dense_params(ref_lin.linear)}
    stats = {}
    if ref_lin.bn_flag:  # inverted flag: True = LayerNorm
        params["norm"] = {"scale": t2j(ref_lin.norm1.weight), "bias": t2j(ref_lin.norm1.bias)}
    else:
        randomize_bn_(ref_lin.norm2)
        params["norm"] = {"scale": t2j(ref_lin.norm2.weight), "bias": t2j(ref_lin.norm2.bias)}
        stats["norm"] = {
            "mean": t2j(ref_lin.norm2.running_mean),
            "var": t2j(ref_lin.norm2.running_var),
        }
    return params, stats


def localtrans_vars(ref_lt, residual_proj):
    params = {
        "q": dense_params(ref_lt.q),
        "k": dense_params(ref_lt.k),
        "v": dense_params(ref_lt.v),
    }
    stats = {}
    p, s = linear_unit_vars(ref_lt.ffn)
    params["ffn"], stats["ffn"] = p, s
    if residual_proj:
        p, s = linear_unit_vars(ref_lt.conv_res)
        params["conv_res"], stats["conv_res"] = p, s
    return params, stats


def rng(seed=0):
    return np.random.default_rng(seed)


class TestLinearUnit:
    def test_batchnorm_parity(self):
        ref = REF["repsurface_utils"].Linear(16, 32, bn=False).eval()
        p, s = linear_unit_vars(ref)
        x = rng(0).normal(size=(2, 10, 16)).astype(np.float32)
        got = LinearUnit(32, norm="batch").apply(
            {"params": p, "batch_stats": s}, jnp.asarray(x), train=False
        )
        want = ref(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_layernorm_parity(self):
        ref = REF["repsurface_utils"].Linear(16, 32, bn=True).eval()
        p, _ = linear_unit_vars(ref)
        x = rng(1).normal(size=(2, 10, 16)).astype(np.float32)
        got = LinearUnit(32, norm="layer").apply(
            {"params": p}, jnp.asarray(x), train=False
        )
        want = ref(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestLocalTransParity:
    def _compare(self, residual_proj, xyz_mode, fps=False):
        torch.manual_seed(42)
        # residual_proj=False adds the raw centre features to the out_c-wide
        # FFN output, so it requires in_c == out_c (reference la1/la2 configs).
        in_c = 3 if xyz_mode else (64 if not residual_proj else 32)
        out_c = 64
        K = 8
        ref = (
            REF["repsurface_utils"]
            .LocalTrans(in_c, out_c, K, usetanh=False, residual=residual_proj)
            .eval()
        )
        p, s = localtrans_vars(ref, residual_proj)

        r = rng(7)
        B, N, S = 2, 32, 16 if fps else 32
        feats = r.normal(size=(B, N, in_c)).astype(np.float32)
        idx = r.integers(0, N, size=(B, S, K)).astype(np.int64)
        fps_idx = r.permutation(N)[:S][None].repeat(B, 0).astype(np.int64) if fps else None

        t_feats = torch.from_numpy(feats)
        t_idx = torch.from_numpy(idx)
        t_fps = torch.from_numpy(fps_idx) if fps else None
        want = (
            ref(features=t_feats, idx=t_idx, pos=None, FPS_idx=t_fps, xyz=xyz_mode)
            .detach()
            .numpy()
        )

        center = (
            np.take_along_axis(feats, fps_idx[..., None], 1) if fps else feats
        )
        got = LocalTrans(out_c, K, residual_proj=residual_proj).apply(
            {"params": p, "batch_stats": s},
            jnp.asarray(feats),
            jnp.asarray(center),
            jnp.asarray(idx),
            xyz_mode=xyz_mode,
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_xyz_mode_with_residual(self):
        self._compare(residual_proj=True, xyz_mode=True)

    def test_feature_mode_no_residual(self):
        self._compare(residual_proj=False, xyz_mode=False)

    def test_feature_mode_with_fps_and_residual(self):
        self._compare(residual_proj=True, xyz_mode=False, fps=True)


class TestLocalMergeParity:
    def _build(self, in_c, out_c, residual):
        torch.manual_seed(3)
        ref = (
            REF["repsurface_utils"]
            .LocalMerge(in_c, out_c, 8, usetanh=False, residual=residual)
            .eval()
        )
        params, stats = {}, {}
        params["xyz_trans"], stats["xyz_trans"] = localtrans_vars(ref.xyz_Trans, True)
        params["feature_trans"], stats["feature_trans"] = localtrans_vars(
            ref.feature_Trans, residual
        )
        params["feature_trans2"], stats["feature_trans2"] = localtrans_vars(
            ref.feature_Trans2, residual
        )
        params["fc2"], stats["fc2"] = linear_unit_vars(ref.fc2)
        return ref, {"params": params, "batch_stats": stats}

    def test_first_state_xyz_branch(self):
        ref, variables = self._build(32, 64, residual=True)
        x = rng(8).normal(size=(2, 32, 3)).astype(np.float32)
        tx = torch.from_numpy(x)
        want = ref(xyz=tx, base_xyz=tx)[0].detach().numpy()
        got, _, _ = LocalMerge(64, 8, residual=True).apply(
            variables, jnp.asarray(x), jnp.asarray(x), train=False
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_transition_state_feature_branch(self):
        ref, variables = self._build(64, 128, residual=True)
        r = rng(9)
        B, N, S = 2, 64, 32
        base_xyz = r.normal(size=(B, N, 3)).astype(np.float32)
        feature = r.normal(size=(B, N, 64)).astype(np.float32)
        fps_idx = np.stack([r.permutation(N)[:S] for _ in range(B)]).astype(np.int64)
        xyz = np.take_along_axis(base_xyz, fps_idx[..., None], 1)

        want = ref(
            xyz=torch.from_numpy(xyz),
            base_xyz=torch.from_numpy(base_xyz),
            feature=torch.from_numpy(feature),
            FPS_idx=torch.from_numpy(fps_idx),
        )[0].detach().numpy()
        got, _, _ = LocalMerge(128, 8, residual=True).apply(
            variables,
            jnp.asarray(xyz),
            jnp.asarray(base_xyz),
            feature=jnp.asarray(feature),
            fps_idx=jnp.asarray(fps_idx),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestUmbrellaConstructorParity:
    def test_parity_sum_aggr(self):
        torch.manual_seed(5)
        ref = (
            REF["repsurface_utils"]
            .UmbrellaSurfaceConstructor(9, 10, aggr_type="sum", return_dist=True, random_inv=False)
            .eval()
        )
        convs = [ref.mlps[0], ref.mlps[3], ref.mlps[6]]
        bns = [ref.mlps[1], ref.mlps[4]]
        for bn in bns:
            randomize_bn_(bn)
        params = {
            "mlp0": {"kernel": t2j(convs[0].weight)[:, :, 0, 0].T},
            "mlp1": {
                "kernel": t2j(convs[1].weight)[:, :, 0, 0].T,
                "bias": t2j(convs[1].bias),
            },
            "mlp2": {
                "kernel": t2j(convs[2].weight)[:, :, 0, 0].T,
                "bias": t2j(convs[2].bias),
            },
            "bn0": {"scale": t2j(bns[0].weight), "bias": t2j(bns[0].bias)},
            "bn1": {"scale": t2j(bns[1].weight), "bias": t2j(bns[1].bias)},
        }
        stats = {
            "bn0": {"mean": t2j(bns[0].running_mean), "var": t2j(bns[0].running_var)},
            "bn1": {"mean": t2j(bns[1].running_mean), "var": t2j(bns[1].running_var)},
        }
        x = rng(10).normal(size=(2, 32, 3)).astype(np.float32)
        want = ref(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()  # [B,C,N]
        got = UmbrellaSurfaceConstructor(k=9, aggr_type="sum", random_inv=False).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
        np.testing.assert_allclose(
            np.asarray(got), want.transpose(0, 2, 1), atol=2e-4
        )


class TestKeepHighEncoder:
    def test_forward_shapes_and_grads(self):
        # residual=False states must keep the channel width (in_c == out_c).
        enc = KeepHighResolutionEncoder(
            npoints=(32, 16), channels=(32, 32, 128), residuals=(True, False, True)
        )
        x = jnp.asarray(rng(11).normal(size=(2, 64, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)
        out = enc.apply(variables, x, train=False)
        assert out.shape == (2, enc.out_features)
        assert np.all(np.isfinite(np.asarray(out)))

        def loss(params):
            y, _ = enc.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.linalg.norm(l)) > 0 for l in leaves)
