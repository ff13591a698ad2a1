"""L2 block tests: golden parity against the reference torch modules with
transplanted weights (eval mode on both sides, randomized BN affines/stats so
the normalization path is genuinely exercised), plus shape/finiteness checks.

The torch side is frozen into tests/fixtures/nn_*.npz (builders in
tests/torch_side/blocks.py; regenerate with MPA_REGEN_ORACLES=1)."""

import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_cache import oracle, subtree  # noqa: E402

from mpa_tpu.nn import (  # noqa: E402
    LinearUnit,
    LocalTrans,
    LocalMerge,
    UmbrellaSurfaceConstructor,
    KeepHighResolutionEncoder,
)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestLinearUnit:
    def test_batchnorm_parity(self):
        def build():
            from torch_side.blocks import linear_unit_fixture
            return linear_unit_fixture("batch")

        f = oracle("nn_linear_unit_batch", build)
        got = LinearUnit(32, norm="batch").apply(
            subtree(f, "variables"), jnp.asarray(f["x"]), train=False
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=1e-5)

    def test_layernorm_parity(self):
        def build():
            from torch_side.blocks import linear_unit_fixture
            return linear_unit_fixture("layer")

        f = oracle("nn_linear_unit_layer", build)
        variables = {"params": subtree(f, "variables/params")}
        got = LinearUnit(32, norm="layer").apply(
            variables, jnp.asarray(f["x"]), train=False
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=1e-5)


class TestLocalTransParity:
    def _compare(self, name, residual_proj, xyz_mode, fps=False):
        def build():
            from torch_side.blocks import localtrans_fixture
            return localtrans_fixture(residual_proj, xyz_mode, fps)

        f = oracle(name, build)
        feats = f["feats"]
        center = (
            np.take_along_axis(feats, f["fps_idx"][..., None], 1) if fps else feats
        )
        got = LocalTrans(64, 8, residual_proj=residual_proj).apply(
            subtree(f, "variables"),
            jnp.asarray(feats),
            jnp.asarray(center),
            jnp.asarray(f["idx"]),
            xyz_mode=xyz_mode,
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=2e-5)

    def test_xyz_mode_with_residual(self):
        self._compare("nn_localtrans_xyz_res", residual_proj=True, xyz_mode=True)

    def test_feature_mode_no_residual(self):
        self._compare("nn_localtrans_feat_nores", residual_proj=False, xyz_mode=False)

    def test_feature_mode_with_fps_and_residual(self):
        self._compare(
            "nn_localtrans_feat_fps_res", residual_proj=True, xyz_mode=False, fps=True
        )


class TestLocalMergeParity:
    def test_first_state_xyz_branch(self):
        def build():
            from torch_side.blocks import localmerge_first_state_fixture
            return localmerge_first_state_fixture()

        f = oracle("nn_localmerge_first", build)
        x = jnp.asarray(f["x"])
        got, _, _ = LocalMerge(64, 8, residual=True).apply(
            subtree(f, "variables"), x, x, train=False
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=2e-5)

    def test_transition_state_feature_branch(self):
        def build():
            from torch_side.blocks import localmerge_transition_fixture
            return localmerge_transition_fixture()

        f = oracle("nn_localmerge_transition", build)
        got, _, _ = LocalMerge(128, 8, residual=True).apply(
            subtree(f, "variables"),
            jnp.asarray(f["xyz"]),
            jnp.asarray(f["base_xyz"]),
            feature=jnp.asarray(f["feature"]),
            fps_idx=jnp.asarray(f["fps_idx"]),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=2e-5)


class TestUmbrellaConstructorParity:
    def test_parity_sum_aggr(self):
        def build():
            from torch_side.blocks import umbrella_fixture
            return umbrella_fixture()

        f = oracle("nn_umbrella_sum", build)
        got = UmbrellaSurfaceConstructor(k=9, aggr_type="sum", random_inv=False).apply(
            subtree(f, "variables"), jnp.asarray(f["x"]), train=False
        )
        np.testing.assert_allclose(np.asarray(got), f["want"], atol=2e-4)


class TestKeepHighEncoder:
    @pytest.mark.slow
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


class TestLinearUnitMidOp:
    """The Dense-before-scatter hoist (LinearUnit mid_op) is algebraically
    identical to scatter-then-LinearUnit: act(norm(scatter(x @ W) + b)) ==
    act(norm(scatter(x) @ W + b)) because scatter-mean commutes with the
    bias-free matmul and maps the bias row exactly (claimed slots keep b,
    unclaimed slots get b either way)."""

    def test_hoist_equals_unhoisted(self):
        import numpy as np

        from mpa_tpu.nn.linear import LinearUnit
        from mpa_tpu.ops import scatter_mean_upsample

        r = np.random.default_rng(5)
        feats = jnp.asarray(r.normal(size=(2, 24, 12)).astype(np.float32))
        # deliberately leave some fine slots unclaimed to pin the bias rule
        idx = jnp.asarray(r.integers(0, 40, size=(2, 24, 4)).astype(np.int32))
        unit = LinearUnit(10, norm="batch")
        mid = lambda y: scatter_mean_upsample(y, idx, 64)
        v = unit.init(jax.random.key(0), feats, mid_op=mid)
        hoisted = unit.apply(v, feats, mid_op=mid, mutable=["batch_stats"])[0]
        unhoisted = unit.apply(v, mid(feats), mutable=["batch_stats"])[0]
        np.testing.assert_allclose(
            np.asarray(hoisted), np.asarray(unhoisted), atol=2e-5
        )
        # unclaimed slots see exactly the bias either way
        claimed = np.zeros((2, 64), bool)
        for b in range(2):
            claimed[b, np.asarray(idx)[b].ravel()] = True
        assert np.any(~claimed)
