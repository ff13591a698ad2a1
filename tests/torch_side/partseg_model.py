"""Torch side of the full part-seg-model parity oracles: the reference
``KeepHighResolutionModulePartSeg`` + head (modules/pointnet2_utils.py:711-858,
models/repsurf/pointnet2_part_seg_msg.py:33-156 — the stack behind the
published 86.76% ins-mIoU), with every weight extractable into MarkovPartSeg's
variable tree. Fixture builders at the bottom."""

import numpy as np
import torch
import torch.nn.functional as F

from torch_side import helpers as H
from torch_side.cls_model import grad_extraction  # noqa: F401 (re-export)
from torch_side.helpers import load_reference, _farthest_point_sample

REF = load_reference()

B, N = 2, 256
LADDER = (128, 64, 32, 16)  # scaled 2x pyramid (2048-regime: 1024/512/256/128)
NUM_PARTS, NUM_CATS = 50, 16
RESIDUALS = (True, False, False, True, True)


class _TorchPartSeg(torch.nn.Module):
    """The reference part-seg get_model rebuilt from its own modules (the file
    under models/repsurf imports a stale path; the graph is identical —
    models/repsurf/pointnet2_part_seg_msg.py:33-156)."""

    def __init__(self):
        super().__init__()
        ref = REF["pointnet2_utils"]
        self.keepHigh = ref.KeepHighResolutionModulePartSeg(3, 64, 128, 256, 512, cuda=False)
        L = ref.Linear
        self.conv8 = L(896, 512, bn=False)
        self.conv9 = L(512, 256, bn=False)
        self.conv10 = L(256, 128, bn=False)
        self.conv11 = torch.nn.Linear(128, NUM_PARTS)
        self.drop1 = torch.nn.Dropout(0.5)

    def forward(self, xyz, cls_label):  # xyz [B, 3, N], cls_label [B, 1, 16]
        _, final = self.keepHigh(xyz, normal=xyz, label=cls_label)
        x = self.drop1(self.conv8(final))
        x = self.conv9(x)
        x = self.conv10(x)
        return self.conv11(x)


def _localmerge_vars(ref_lm, residual, xyz_only=False):
    params, stats = {}, {}
    params["xyz_trans"], stats["xyz_trans"] = H.localtrans_vars(ref_lm.xyz_Trans, True)
    if xyz_only:  # first state: feature=None path uses only the xyz branch
        return params, stats
    params["feature_trans"], stats["feature_trans"] = H.localtrans_vars(
        ref_lm.feature_Trans1, residual
    )
    params["feature_trans2"], stats["feature_trans2"] = H.localtrans_vars(
        ref_lm.feature_Trans2, residual
    )
    params["fc2"], stats["fc2"] = H.linear_unit_vars(ref_lm.fc2)
    return params, stats


def _fuse_vars(ref_fuse, t):
    """Transplant the conv{s}{t} row + conv{t} used by target t."""
    params, stats = {}, {}
    for s in range(5):
        if s == t:
            continue
        name = f"conv{s}{t}"
        params[name], stats[name] = H.linear_unit_vars(getattr(ref_fuse, name))
    params[f"conv{t}"], stats[f"conv{t}"] = H.linear_unit_vars(
        getattr(ref_fuse, f"conv{t}")
    )
    return params, stats


def extract_variables(tmodel):
    """Map every torch weight into MarkovPartSeg's variable tree. Re-runnable
    on the same model (e.g. with H.t2j patched to read ``.grad``)."""
    kh = tmodel.keepHigh
    p, s = {}, {}
    for i in range(5):
        lm = getattr(kh, f"la{i}")
        p[f"la{i}"], s[f"la{i}"] = _localmerge_vars(lm, RESIDUALS[i], xyz_only=(i == 0))
    for i in range(1, 5):
        lm = getattr(kh, f"la{i}_up")
        p[f"la{i}_up"], s[f"la{i}_up"] = _localmerge_vars(lm, False)
        p[f"up_conv{i}"], s[f"up_conv{i}"] = H.linear_unit_vars(getattr(kh, f"up_conv{i}"))
    p["mlp"], s["mlp"] = H.linear_unit_vars(kh.mlp)
    # fuse1..fuse5 update targets 4, 3, 2, 1, 0 respectively.
    for k, t in zip(range(1, 6), (4, 3, 2, 1, 0)):
        p[f"fuse{k}"], s[f"fuse{k}"] = _fuse_vars(getattr(kh, f"fuse{k}"), t)
    p["conv5"], s["conv5"] = H.linear_unit_vars(kh.conv5)
    p["conv7"], s["conv7"] = H.linear_unit_vars(kh.conv7)

    params = {"keep_high": p}
    stats = {"keep_high": s}
    for name in ("conv8", "conv9", "conv10"):
        params[name], stats[name] = H.linear_unit_vars(getattr(tmodel, name))
    params["conv11"] = H.dense_params(tmodel.conv11)
    return {"params": params, "batch_stats": stats}


def build_transplanted():
    """Deterministic (seed 77) torch model + its extracted variable tree."""
    torch.manual_seed(77)
    tmodel = _TorchPartSeg().eval()
    variables = extract_variables(tmodel)
    return tmodel, variables


def run_ref(tmodel, x, onehot, grad=False):
    """Drive the torch reference with deterministic FPS (scaled ladder) and a
    CPU upsample (the reference's is torch.cuda-only). With ``grad=True``,
    ``x`` may be a torch tensor with requires_grad and the raw log-probs
    tensor is returned (no detach)."""
    ref_mod = REF["pointnet2_utils"]
    orig_fps, orig_up = ref_mod.farthest_point_sample, ref_mod.upsample
    ladder = iter(LADDER)

    def fps(xyz, n):
        return _farthest_point_sample(xyz, next(ladder))

    def cpu_upsample(points, knn_idx_, scale_ratio=2, dist=None):
        Bq, S, C = points.shape
        K = knn_idx_.shape[-1]
        points1 = points.unsqueeze(-2).repeat(1, 1, K, 1)
        big = torch.zeros(Bq, S, S * scale_ratio, C)
        out = big.scatter_(
            -2, knn_idx_.unsqueeze(-1).repeat(1, 1, 1, C).long(), points1
        )
        total = torch.sum(out, dim=1)
        nz = torch.count_nonzero(out[:, :, :, 0], dim=1).unsqueeze(-1).float()
        nz = torch.where(nz == 0.0, torch.ones_like(nz), nz)
        return total / nz

    ref_mod.farthest_point_sample = fps
    ref_mod.upsample = cpu_upsample
    try:
        if grad:
            xt = x if torch.is_tensor(x) else torch.from_numpy(x.transpose(0, 2, 1))
            logits = tmodel(xt, torch.from_numpy(onehot[:, None, :]))
            return F.log_softmax(logits, -1)
        with torch.no_grad():
            logits = tmodel(
                torch.from_numpy(x.transpose(0, 2, 1)),
                torch.from_numpy(onehot[:, None, :]),
            )
    finally:
        ref_mod.farthest_point_sample = orig_fps
        ref_mod.upsample = orig_up
    return F.log_softmax(logits, -1).numpy()


# --- fixture builders -------------------------------------------------------

def forward_fixture():
    """Transplanted variables + eval-mode forwards on two input draws."""
    tmodel, variables = build_transplanted()
    out = {"variables": variables}
    for name, seed in (("logits", 0), ("pred", 1)):
        r = np.random.default_rng(seed)
        x = r.normal(size=(B, N, 3)).astype(np.float32)
        cats = r.integers(0, NUM_CATS, size=(B,))
        onehot = np.eye(NUM_CATS, dtype=np.float32)[cats]
        out[f"x_{name}"] = x
        out[f"onehot_{name}"] = onehot
        out[f"want_{name}"] = run_ref(tmodel, x, onehot)
    return out


def grad_fixture():
    """Eval-mode per-point NLL gradients wrt input and every param leaf."""
    tmodel, _ = build_transplanted()
    r = np.random.default_rng(5)
    x = r.normal(size=(B, N, 3)).astype(np.float32)
    cats = r.integers(0, NUM_CATS, size=(B,))
    onehot = np.eye(NUM_CATS, dtype=np.float32)[cats]
    seg = r.integers(0, NUM_PARTS, size=(B, N))

    xt = torch.from_numpy(x.transpose(0, 2, 1)).requires_grad_(True)
    lp = run_ref(tmodel, xt, onehot, grad=True)  # [B, N, 50] log-probs
    loss = -torch.gather(lp, -1, torch.from_numpy(seg)[..., None]).mean()
    tmodel.zero_grad()
    loss.backward()
    with grad_extraction():
        want_params = extract_variables(tmodel)["params"]
    return {
        "x": x,
        "onehot": onehot,
        "seg": seg,
        "loss": np.float32(loss.detach()),
        "want_x": xt.grad.numpy().transpose(0, 2, 1),
        "want_params": want_params,
    }


def train_curve_fixture(steps=15, lr=2e-3, momentum=0.0):
    """SGD training-loss curve from the transplanted init on deterministic
    synthetic batches, dropout off (draws can't be shared across frameworks)."""
    tmodel, variables = build_transplanted()
    tmodel.train()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()

    r = np.random.default_rng(11)
    xs = r.normal(size=(2, B, N, 3)).astype(np.float32)
    cats = r.integers(0, NUM_CATS, size=(2, B))
    ohs = np.eye(NUM_CATS, dtype=np.float32)[cats]
    segs = r.integers(0, NUM_PARTS, size=(2, B, N))

    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=momentum)
    losses = []
    for i in range(steps):
        j = i % 2
        opt.zero_grad()
        logp = run_ref(tmodel, xs[j], ohs[j], grad=True)
        tgt = torch.from_numpy(segs[j]).long()
        loss = -logp.gather(-1, tgt.unsqueeze(-1)).mean()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return {"variables": variables, "want": np.asarray(losses, np.float32)}
