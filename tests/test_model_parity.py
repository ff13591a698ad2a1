"""Full-model golden parity: the reference cls Model (KeepHighResolutionModule
ladder + FC head, models/repsurf/repsurf_ssg_umb.py) vs MarkovClassifier with
every weight transplanted, eval mode, deterministic FPS on both sides."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle import load_reference, _farthest_point_sample  # noqa: E402
import test_nn_blocks as H  # noqa: E402

from mpa_tpu.models import MarkovClassifier  # noqa: E402

REF = load_reference()


class _Args:
    num_point = 256
    return_dist = True
    num_class = 15
    cuda_ops = False


def _bn_vars(bn):
    H.randomize_bn_(bn)
    params = {"scale": H.t2j(bn.weight), "bias": H.t2j(bn.bias)}
    stats = {"mean": H.t2j(bn.running_mean), "var": H.t2j(bn.running_var)}
    return params, stats


def _localmerge_vars(ref_lm, residual):
    params, stats = {}, {}
    params["xyz_trans"], stats["xyz_trans"] = H.localtrans_vars(ref_lm.xyz_Trans, True)
    params["feature_trans"], stats["feature_trans"] = H.localtrans_vars(
        ref_lm.feature_Trans, residual
    )
    params["feature_trans2"], stats["feature_trans2"] = H.localtrans_vars(
        ref_lm.feature_Trans2, residual
    )
    params["fc2"], stats["fc2"] = H.linear_unit_vars(ref_lm.fc2)
    return params, stats


def build_transplanted():
    torch.manual_seed(123)
    ref = REF["repsurface_utils"]

    # Deterministic FPS on the torch side (the reference starts at randint).
    ref.farthest_point_sample = lambda xyz, n: _farthest_point_sample(xyz, n)

    tmodel = _TorchModel(_Args())
    tmodel.eval()
    variables = extract_variables(tmodel)

    jmodel = MarkovClassifier(
        num_classes=15,
        npoints=(128, 64, 32, 16, 8),  # scaled ladder for a 256-pt test cloud
        channels=(64, 64, 64, 128, 256, 512),
        residuals=(True, False, False, True, True, True),
    )
    return tmodel, jmodel, variables


def extract_variables(tmodel):
    """Map every torch weight of the full cls model into MarkovClassifier's
    variable tree. Re-runnable on the same model (e.g. with H.t2j patched to
    read ``.grad`` for gradient-parity extraction)."""
    residuals = (True, False, False, True, True, True)
    kh_params, kh_stats = {}, {}
    for i in range(6):
        lm = getattr(tmodel.keepHigh, f"la{i}")
        p, s = _localmerge_vars(lm, residuals[i])
        kh_params[f"la{i}"], kh_stats[f"la{i}"] = p, s
    kh_params["conv3"], kh_stats["conv3"] = H.linear_unit_vars(tmodel.keepHigh.conv3)
    kh_params["conv4"], kh_stats["conv4"] = H.linear_unit_vars(tmodel.keepHigh.conv4)
    kh_params["final_class"] = H.dense_params(tmodel.keepHigh.final_class)
    p, s = _bn_vars(tmodel.keepHigh.bn)
    kh_params["final_bn"], kh_stats["final_bn"] = p, s

    params = {"keep_high": kh_params}
    stats = {"keep_high": kh_stats}
    for i in (1, 2):
        params[f"fc{i}"] = H.dense_params(getattr(tmodel, f"fc{i}"))
        p, s = _bn_vars(getattr(tmodel, f"bn{i}"))
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    params["fc3"] = H.dense_params(tmodel.fc3)
    return {"params": params, "batch_stats": stats}


class _TorchModel(torch.nn.Module):
    """The reference cls Model rebuilt from its own modules (the file under
    models/repsurf imports a stale path; the module graph is identical —
    models/repsurf/repsurf_ssg_umb.py:35-70) with the npoint ladder scaled to
    the test cloud via constructor-level monkeypatching of FPS sizes."""

    def __init__(self, args):
        super().__init__()
        ref = REF["repsurface_utils"]
        self.keepHigh = ref.KeepHighResolutionModule(3, 64, 64, 64, 64, cuda=False)
        self.fc1 = torch.nn.Linear(1024, 512)
        self.bn1 = torch.nn.BatchNorm1d(512)
        self.fc2 = torch.nn.Linear(512, 256)
        self.bn2 = torch.nn.BatchNorm1d(256)
        self.fc3 = torch.nn.Linear(256, args.num_class)
        self.lrelu = torch.nn.LeakyReLU(negative_slope=0.2)

    def forward(self, points):  # points [B, 3, N]
        center = points[:, :3, :]
        final = self.keepHigh(center, center)
        x = self.lrelu(self.bn1(self.fc1(final)))
        x = self.lrelu(self.bn2(self.fc2(x)))
        return torch.nn.functional.log_softmax(self.fc3(x), -1)


def _patch_ladder(keephigh, sizes):
    """The reference hardcodes FPS sizes 512..32 in forward; re-run its forward
    with a scaled ladder by temporarily swapping the module's FPS function."""
    ref = REF["repsurface_utils"]
    orig = ref.farthest_point_sample
    ladder = iter(sizes)

    def fps(xyz, n):
        return _farthest_point_sample(xyz, next(ladder))

    ref.farthest_point_sample = fps
    return orig


class TestFullClsModelParity:
    def test_logits_match(self):
        tmodel, jmodel, variables = build_transplanted()
        r = np.random.default_rng(0)
        x = r.normal(size=(2, 256, 3)).astype(np.float32)

        sizes = (128, 64, 32, 16, 8)
        ref_mod = REF["repsurface_utils"]
        orig = _patch_ladder(tmodel.keepHigh, sizes)
        try:
            with torch.no_grad():
                want = tmodel(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        finally:
            ref_mod.farthest_point_sample = orig

        got = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_prediction_agreement(self):
        tmodel, jmodel, variables = build_transplanted()
        r = np.random.default_rng(1)
        x = r.normal(size=(4, 256, 3)).astype(np.float32)
        sizes = (128, 64, 32, 16, 8)
        ref_mod = REF["repsurface_utils"]
        orig = _patch_ladder(tmodel.keepHigh, sizes * 2)  # 2 batches? one call
        try:
            with torch.no_grad():
                want = tmodel(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        finally:
            ref_mod.farthest_point_sample = orig
        got = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
