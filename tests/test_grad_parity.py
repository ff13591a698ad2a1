"""Backward-pass golden parity: jax.grad on the transplanted full models vs
torch.autograd on the references (VERDICT r1 item 5). Validates the
softmax-minus-1 analytic fold, the stop-gradient kNN/FPS selection, and the
scatter-mean / gather VJPs *as training code*, not just inference.

Both sides run eval-mode forward (deterministic: no dropout, BN running
stats) and differentiate a mean-NLL loss wrt (a) the input cloud and (b)
every parameter leaf. The parameter-gradient tree is extracted by re-running
the transplant mapping with H.t2j patched to read ``.grad``."""

import os
import sys
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import load_reference  # noqa: E402
import test_nn_blocks as H  # noqa: E402
import test_model_parity as CLS  # noqa: E402
import test_partseg_model_parity as SEG  # noqa: E402

REF = load_reference()


@contextmanager
def grad_extraction():
    """Make the transplant helpers read ``.grad`` instead of data, and stop
    them re-randomizing BN stats."""
    orig_t2j, orig_rand = H.t2j, H.randomize_bn_

    def t2j_grad(t):
        if t.grad is None:  # running stats / frozen leaves
            return jnp.zeros(tuple(t.shape), jnp.float32)
        return jnp.asarray(t.grad.detach().numpy())

    H.t2j, H.randomize_bn_ = t2j_grad, lambda bn: None
    try:
        yield
    finally:
        H.t2j, H.randomize_bn_ = orig_t2j, orig_rand


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree)


def _compare_trees(got_tree, want_tree, atol, rtol=1e-3):
    got = dict(_flatten(got_tree))
    want = dict(_flatten(want_tree))
    assert set(got) == set(want), (
        f"param tree mismatch: only-jax={set(got) - set(want)} "
        f"only-torch={set(want) - set(got)}"
    )
    n_checked = 0
    for path in sorted(got):
        np.testing.assert_allclose(
            got[path], want[path], atol=atol, rtol=rtol,
            err_msg=f"grad mismatch at {'/'.join(path)}",
        )
        n_checked += 1
    assert n_checked > 50  # the whole model, not a token few


class TestClsGradParity:
    def _run(self):
        tmodel, jmodel, variables = CLS.build_transplanted()
        r = np.random.default_rng(3)
        x = r.normal(size=(2, 256, 3)).astype(np.float32)
        labels = np.array([4, 11])

        # ---- torch side --------------------------------------------------
        xt = torch.from_numpy(x.transpose(0, 2, 1)).requires_grad_(True)
        ref_mod = REF["repsurface_utils"]
        orig = CLS._patch_ladder(tmodel.keepHigh, (128, 64, 32, 16, 8))
        try:
            out = tmodel(xt)  # log-probs [2, 15]
        finally:
            ref_mod.farthest_point_sample = orig
        loss_t = -out[torch.arange(2), torch.from_numpy(labels)].mean()
        tmodel.zero_grad()
        loss_t.backward()
        with grad_extraction():
            want = CLS.extract_variables(tmodel)["params"]
        want_x = xt.grad.numpy().transpose(0, 2, 1)

        # ---- jax side ----------------------------------------------------
        def loss_fn(params, xin):
            lp = jmodel.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xin, train=False,
            )
            return -lp[jnp.arange(2), jnp.asarray(labels)].mean()

        (gp, gx) = jax.grad(loss_fn, argnums=(0, 1))(
            variables["params"], jnp.asarray(x)
        )
        lt, lj = float(loss_t.detach()), float(loss_fn(variables["params"], jnp.asarray(x)))
        assert abs(lt - lj) < 5e-5, (lt, lj)
        return gp, want, np.asarray(gx), want_x

    def test_param_grads_match(self):
        gp, want, gx, want_x = self._run()
        _compare_trees(gp, want, atol=1e-4)

    def test_input_grads_match(self):
        gp, want, gx, want_x = self._run()
        np.testing.assert_allclose(gx, want_x, atol=1e-4, rtol=1e-3)


class TestPartSegGradParity:
    def _run(self):
        tmodel, jmodel, variables = SEG.build_transplanted()
        r = np.random.default_rng(5)
        x = r.normal(size=(SEG.B, SEG.N, 3)).astype(np.float32)
        cats = r.integers(0, SEG.NUM_CATS, size=(SEG.B,))
        onehot = np.eye(SEG.NUM_CATS, dtype=np.float32)[cats]
        seg = r.integers(0, SEG.NUM_PARTS, size=(SEG.B, SEG.N))

        # ---- torch side --------------------------------------------------
        xt = torch.from_numpy(x.transpose(0, 2, 1)).requires_grad_(True)
        lp = SEG._run_ref(tmodel, xt, onehot, grad=True)  # [B, N, 50] log-probs
        idx = torch.from_numpy(seg)
        loss_t = -torch.gather(lp, -1, idx[..., None]).mean()
        tmodel.zero_grad()
        loss_t.backward()
        with grad_extraction():
            want = SEG.extract_variables(tmodel)
        want_params = {"keep_high": want["params"]["keep_high"]}
        for name in ("conv8", "conv9", "conv10", "conv11"):
            want_params[name] = want["params"][name]
        want_x = xt.grad.numpy().transpose(0, 2, 1)

        # ---- jax side ----------------------------------------------------
        def loss_fn(params, xin):
            out = jmodel.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                (xin, jnp.asarray(onehot)), train=False,
            )
            return -jnp.take_along_axis(out, jnp.asarray(seg)[..., None], -1).mean()

        (gp, gx) = jax.grad(loss_fn, argnums=(0, 1))(
            variables["params"], jnp.asarray(x)
        )
        lt, lj = float(loss_t.detach()), float(loss_fn(variables["params"], jnp.asarray(x)))
        assert abs(lt - lj) < 5e-5, (lt, lj)
        return gp, want_params, np.asarray(gx), want_x

    def test_param_grads_match(self):
        gp, want, gx, want_x = self._run()
        _compare_trees(gp, want, atol=1e-4)

    def test_input_grads_match(self):
        gp, want, gx, want_x = self._run()
        np.testing.assert_allclose(gx, want_x, atol=1e-4, rtol=1e-3)
