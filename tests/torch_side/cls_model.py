"""Torch side of the full-cls-model parity oracles: the reference cls Model
(KeepHighResolutionModule ladder + FC head, models/repsurf/repsurf_ssg_umb.py)
rebuilt from its own modules, with every weight extractable into
MarkovClassifier's variable tree. Fixture builders at the bottom."""

import itertools
from contextlib import contextmanager

import numpy as np
import torch

from torch_side import helpers as H
from torch_side.helpers import load_reference, _farthest_point_sample

REF = load_reference()

# The jax-side model config these transplants target (mirrored in the test
# modules, which construct MarkovClassifier with exactly these settings).
NUM_CLASSES = 15
LADDER = (128, 64, 32, 16, 8)  # scaled ladder for a 256-pt test cloud
CHANNELS = (64, 64, 64, 128, 256, 512)
RESIDUALS = (True, False, False, True, True, True)


class _TorchModel(torch.nn.Module):
    """The reference cls Model rebuilt from its own modules (the file under
    models/repsurf imports a stale path; the module graph is identical —
    models/repsurf/repsurf_ssg_umb.py:35-70)."""

    def __init__(self, num_class=NUM_CLASSES):
        super().__init__()
        ref = REF["repsurface_utils"]
        self.keepHigh = ref.KeepHighResolutionModule(3, 64, 64, 64, 64, cuda=False)
        self.fc1 = torch.nn.Linear(1024, 512)
        self.bn1 = torch.nn.BatchNorm1d(512)
        self.fc2 = torch.nn.Linear(512, 256)
        self.bn2 = torch.nn.BatchNorm1d(256)
        self.fc3 = torch.nn.Linear(256, num_class)
        self.lrelu = torch.nn.LeakyReLU(negative_slope=0.2)

    def forward(self, points):  # points [B, 3, N]
        center = points[:, :3, :]
        final = self.keepHigh(center, center)
        x = self.lrelu(self.bn1(self.fc1(final)))
        x = self.lrelu(self.bn2(self.fc2(x)))
        return torch.nn.functional.log_softmax(self.fc3(x), -1)


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


def extract_variables(tmodel):
    """Map every torch weight of the full cls model into MarkovClassifier's
    variable tree. Re-runnable on the same model (e.g. with H.t2j patched to
    read ``.grad`` for gradient-parity extraction)."""
    kh_params, kh_stats = {}, {}
    for i in range(6):
        lm = getattr(tmodel.keepHigh, f"la{i}")
        p, s = _localmerge_vars(lm, RESIDUALS[i])
        kh_params[f"la{i}"], kh_stats[f"la{i}"] = p, s
    kh_params["conv3"], kh_stats["conv3"] = H.linear_unit_vars(tmodel.keepHigh.conv3)
    kh_params["conv4"], kh_stats["conv4"] = H.linear_unit_vars(tmodel.keepHigh.conv4)
    kh_params["final_class"] = H.dense_params(tmodel.keepHigh.final_class)
    p, s = H.bn_vars(tmodel.keepHigh.bn)
    kh_params["final_bn"], kh_stats["final_bn"] = p, s

    params = {"keep_high": kh_params}
    stats = {"keep_high": kh_stats}
    for i in (1, 2):
        params[f"fc{i}"] = H.dense_params(getattr(tmodel, f"fc{i}"))
        p, s = H.bn_vars(getattr(tmodel, f"bn{i}"))
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    params["fc3"] = H.dense_params(tmodel.fc3)
    return {"params": params, "batch_stats": stats}


def build_transplanted():
    """Deterministic (seed 123) torch model + its extracted variable tree."""
    torch.manual_seed(123)
    ref = REF["repsurface_utils"]
    # Deterministic FPS on the torch side (the reference starts at randint).
    ref.farthest_point_sample = lambda xyz, n: _farthest_point_sample(xyz, n)
    tmodel = _TorchModel()
    tmodel.eval()
    variables = extract_variables(tmodel)
    return tmodel, variables


@contextmanager
def patched_ladder(sizes):
    """The reference hardcodes FPS sizes 512..32 in forward; run its forward
    with a scaled ladder by temporarily swapping the module's FPS function."""
    ref = REF["repsurface_utils"]
    orig = ref.farthest_point_sample
    ladder = iter(sizes)
    ref.farthest_point_sample = lambda xyz, n: _farthest_point_sample(
        xyz, next(ladder)
    )
    try:
        yield
    finally:
        ref.farthest_point_sample = orig


@contextmanager
def grad_extraction():
    """Make the transplant helpers read ``.grad`` instead of data, and stop
    them re-randomizing BN stats."""
    orig_t2j, orig_rand = H.t2j, H.randomize_bn_

    def t2j_grad(t):
        if t.grad is None:  # running stats / frozen leaves
            return np.zeros(tuple(t.shape), np.float32)
        return t.grad.detach().numpy().copy()

    H.t2j, H.randomize_bn_ = t2j_grad, lambda bn: None
    try:
        yield
    finally:
        H.t2j, H.randomize_bn_ = orig_t2j, orig_rand


# --- fixture builders -------------------------------------------------------

def forward_fixture():
    """Transplanted variables + eval-mode forwards on two input draws
    (the round-1 test_logits_match / test_prediction_agreement cases)."""
    tmodel, variables = build_transplanted()
    out = {"variables": variables}
    for name, seed, batch in (("logits", 0, 2), ("pred", 1, 4)):
        r = np.random.default_rng(seed)
        x = r.normal(size=(batch, 256, 3)).astype(np.float32)
        with patched_ladder(LADDER):
            with torch.no_grad():
                want = tmodel(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        out[f"x_{name}"] = x
        out[f"want_{name}"] = want
    return out


def grad_fixture():
    """Eval-mode NLL gradients wrt input and every parameter leaf
    (the round-1 test_grad_parity cls cases)."""
    tmodel, _ = build_transplanted()
    r = np.random.default_rng(3)
    x = r.normal(size=(2, 256, 3)).astype(np.float32)
    labels = np.array([4, 11])

    xt = torch.from_numpy(x.transpose(0, 2, 1)).requires_grad_(True)
    with patched_ladder(LADDER):
        out = tmodel(xt)  # log-probs [2, 15]
    loss = -out[torch.arange(2), torch.from_numpy(labels)].mean()
    tmodel.zero_grad()
    loss.backward()
    with grad_extraction():
        want_params = extract_variables(tmodel)["params"]
    return {
        "x": x,
        "labels": labels,
        "loss": np.float32(loss.detach()),
        "want_x": xt.grad.numpy().transpose(0, 2, 1),
        "want_params": want_params,
    }


def train_curve_fixture(steps=25, lr=2e-3, momentum=0.0, batch=8):
    """SGD training-loss curve from the transplanted init on deterministic
    synthetic batches (the round-1 training-curve equivalence case)."""
    tmodel, variables = build_transplanted()
    r = np.random.default_rng(0)
    xs = r.normal(size=(2, batch, 256, 3)).astype(np.float32)
    ys = r.integers(0, NUM_CLASSES, size=(2, batch))

    ref_mod = REF["repsurface_utils"]
    orig = ref_mod.farthest_point_sample
    ladder = itertools.cycle(LADDER)
    ref_mod.farthest_point_sample = lambda xyz, n: _farthest_point_sample(
        xyz, next(ladder)
    )
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=momentum)
    tmodel.train()
    losses = []
    try:
        for i in range(steps):
            x, y = xs[i % 2], ys[i % 2]
            opt.zero_grad()
            out = tmodel(torch.from_numpy(x.transpose(0, 2, 1)))
            loss = -out[torch.arange(batch), torch.from_numpy(y)].mean()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
    finally:
        ref_mod.farthest_point_sample = orig
    return {"variables": variables, "want": np.asarray(losses, np.float32)}
