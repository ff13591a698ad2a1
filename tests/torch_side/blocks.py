"""Torch-side fixture builders for the L2 block parity oracles
(LinearUnit / LocalTrans / LocalMerge / Umbrella / Fuse / FeaturePropagation).

Where a case needs FPS/kNN index inputs, they are computed with the mpa_tpu
ops at build time and STORED IN THE FIXTURE, so both frameworks are compared
on identical frozen indices (the index-producing ops have their own parity
tests in test_ops.py / test_pallas_kernels.py)."""

import numpy as np
import torch

from torch_side import helpers as H
from torch_side.helpers import load_reference

REF = load_reference()


def _rng(seed=0):
    return np.random.default_rng(seed)


# --- LinearUnit -------------------------------------------------------------

def linear_unit_fixture(norm):
    torch.manual_seed({"batch": 100, "layer": 101}[norm])
    ref = REF["repsurface_utils"].Linear(16, 32, bn=(norm == "layer")).eval()
    p, s = H.linear_unit_vars(ref)
    x = _rng(0 if norm == "batch" else 1).normal(size=(2, 10, 16)).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy()
    return {"variables": {"params": p, "batch_stats": s}, "x": x, "want": want}


# --- LocalTrans -------------------------------------------------------------

def localtrans_fixture(residual_proj, xyz_mode, fps=False):
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
    p, s = H.localtrans_vars(ref, residual_proj)

    r = _rng(7)
    B, Np, S = 2, 32, 16 if fps else 32
    feats = r.normal(size=(B, Np, in_c)).astype(np.float32)
    idx = r.integers(0, Np, size=(B, S, K)).astype(np.int64)
    fps_idx = (
        r.permutation(Np)[:S][None].repeat(B, 0).astype(np.int64) if fps else None
    )

    t_fps = torch.from_numpy(fps_idx) if fps else None
    want = (
        ref(
            features=torch.from_numpy(feats),
            idx=torch.from_numpy(idx),
            pos=None,
            FPS_idx=t_fps,
            xyz=xyz_mode,
        )
        .detach()
        .numpy()
    )
    out = {
        "variables": {"params": p, "batch_stats": s},
        "feats": feats,
        "idx": idx,
        "want": want,
    }
    if fps:
        out["fps_idx"] = fps_idx
    return out


# --- cls LocalMerge ---------------------------------------------------------

def _cls_localmerge(in_c, out_c, residual, seed=3):
    torch.manual_seed(seed)
    ref = (
        REF["repsurface_utils"]
        .LocalMerge(in_c, out_c, 8, usetanh=False, residual=residual)
        .eval()
    )
    params, stats = {}, {}
    params["xyz_trans"], stats["xyz_trans"] = H.localtrans_vars(ref.xyz_Trans, True)
    params["feature_trans"], stats["feature_trans"] = H.localtrans_vars(
        ref.feature_Trans, residual
    )
    params["feature_trans2"], stats["feature_trans2"] = H.localtrans_vars(
        ref.feature_Trans2, residual
    )
    params["fc2"], stats["fc2"] = H.linear_unit_vars(ref.fc2)
    return ref, {"params": params, "batch_stats": stats}


def localmerge_first_state_fixture():
    ref, variables = _cls_localmerge(32, 64, residual=True)
    x = _rng(8).normal(size=(2, 32, 3)).astype(np.float32)
    tx = torch.from_numpy(x)
    with torch.no_grad():
        want = ref(xyz=tx, base_xyz=tx)[0].numpy()
    return {"variables": variables, "x": x, "want": want}


def localmerge_transition_fixture():
    ref, variables = _cls_localmerge(64, 128, residual=True)
    r = _rng(9)
    B, N, S = 2, 64, 32
    base_xyz = r.normal(size=(B, N, 3)).astype(np.float32)
    feature = r.normal(size=(B, N, 64)).astype(np.float32)
    fps_idx = np.stack([r.permutation(N)[:S] for _ in range(B)]).astype(np.int64)
    xyz = np.take_along_axis(base_xyz, fps_idx[..., None], 1)
    with torch.no_grad():
        want = ref(
            xyz=torch.from_numpy(xyz),
            base_xyz=torch.from_numpy(base_xyz),
            feature=torch.from_numpy(feature),
            FPS_idx=torch.from_numpy(fps_idx),
        )[0].numpy()
    return {
        "variables": variables,
        "xyz": xyz,
        "base_xyz": base_xyz,
        "feature": feature,
        "fps_idx": fps_idx,
        "want": want,
    }


# --- UmbrellaSurfaceConstructor --------------------------------------------

def umbrella_fixture():
    torch.manual_seed(5)
    ref = (
        REF["repsurface_utils"]
        .UmbrellaSurfaceConstructor(
            9, 10, aggr_type="sum", return_dist=True, random_inv=False
        )
        .eval()
    )
    convs = [ref.mlps[0], ref.mlps[3], ref.mlps[6]]
    bns = [ref.mlps[1], ref.mlps[4]]
    for bn in bns:
        H.randomize_bn_(bn)
    params = {
        "mlp0": {"kernel": H.t2j(convs[0].weight)[:, :, 0, 0].T},
        "mlp1": {
            "kernel": H.t2j(convs[1].weight)[:, :, 0, 0].T,
            "bias": H.t2j(convs[1].bias),
        },
        "mlp2": {
            "kernel": H.t2j(convs[2].weight)[:, :, 0, 0].T,
            "bias": H.t2j(convs[2].bias),
        },
        "bn0": {"scale": H.t2j(bns[0].weight), "bias": H.t2j(bns[0].bias)},
        "bn1": {"scale": H.t2j(bns[1].weight), "bias": H.t2j(bns[1].bias)},
    }
    stats = {
        "bn0": {"mean": H.t2j(bns[0].running_mean), "var": H.t2j(bns[0].running_var)},
        "bn1": {"mean": H.t2j(bns[1].running_mean), "var": H.t2j(bns[1].running_var)},
    }
    x = _rng(10).normal(size=(2, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy()  # [B, C, N]
    return {
        "variables": {"params": params, "batch_stats": stats},
        "x": x,
        "want": want.transpose(0, 2, 1),
    }


# --- part-seg 3-branch LocalMerge ------------------------------------------

def partseg_localmerge_fixture():
    torch.manual_seed(21)
    ref = (
        REF["pointnet2_utils"]
        .LocalMerge(64, 128, 8, usetanh=False, residual=True)
        .eval()
    )
    params, stats = {}, {}
    params["xyz_trans"], stats["xyz_trans"] = H.localtrans_vars(ref.xyz_Trans, True)
    params["feature_trans"], stats["feature_trans"] = H.localtrans_vars(
        ref.feature_Trans1, True
    )
    params["feature_trans2"], stats["feature_trans2"] = H.localtrans_vars(
        ref.feature_Trans2, True
    )
    params["fc2"], stats["fc2"] = H.linear_unit_vars(ref.fc2)

    r = _rng(0)
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
    return {
        "variables": {"params": params, "batch_stats": stats},
        "xyz": xyz,
        "base_xyz": base_xyz,
        "feature": feature,
        "fps_idx": fps_idx,
        "want": want,
    }


# --- Fuse -------------------------------------------------------------------

def fuse_fixture(t):
    """One Fuse step at the num_point selecting target ``t``, on a 5-scale
    pyramid with real FPS chains / encoder kNN (computed with the mpa_tpu ops
    and frozen into the fixture)."""
    import jax.numpy as jnp
    from mpa_tpu import ops

    torch.manual_seed(31 + t)
    r = _rng(t)
    B = 2
    sizes = (128, 64, 32, 16, 8)
    ch = (64, 64, 64, 128, 256)
    xyz = [np.asarray(r.normal(size=(B, sizes[0], 3)), np.float32)]
    fps, knn_idx = [], []
    for j, n in enumerate(sizes[1:]):
        fi = ops.farthest_point_sample(jnp.asarray(xyz[j]), n)
        xyz.append(np.asarray(ops.index_points(jnp.asarray(xyz[j]), fi)))
        fps.append(np.asarray(fi))
        _, ki = ops.knn(8, jnp.asarray(xyz[j]), jnp.asarray(xyz[j + 1]))
        knn_idx.append(np.asarray(ki))
    feats = [
        np.asarray(r.normal(size=(B, n, c)), np.float32)
        for n, c in zip(sizes, ch)
    ]

    ref_fuse = REF["pointnet2_utils"].Fuse(*ch).eval()
    params, stats = {}, {}
    for s in range(5):
        if s == t:
            continue
        name = f"conv{s}{t}"
        params[name], stats[name] = H.linear_unit_vars(getattr(ref_fuse, name))
    params[f"conv{t}"], stats[f"conv{t}"] = H.linear_unit_vars(
        getattr(ref_fuse, f"conv{t}")
    )

    # Reference upsample is CUDA-only (torch.cuda.FloatTensor); patch a CPU
    # equivalent into the oracle module.
    ref_mod = REF["pointnet2_utils"]
    orig_upsample = ref_mod.upsample

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

    ref_mod.upsample = cpu_upsample
    try:
        tt = [torch.from_numpy(f) for f in feats]
        tf = [torch.from_numpy(i) for i in fps]
        tk = [None] + [torch.from_numpy(i) for i in knn_idx]
        tx = [torch.from_numpy(x) for x in xyz]
        num_point = {4: 128, 3: 256, 2: 512, 1: 1024, 0: 2048}[t]
        with torch.no_grad():
            out = ref_fuse(
                num_point,
                f0=tt[0], f1=tt[1], f2=tt[2], f3=tt[3], f4=tt[4],
                FPS_0=tf[0], FPS_1=tf[1], FPS_2=tf[2], FPS_3=tf[3],
                knn_0=tk[0], knn_1=tk[1], knn_2=tk[2], knn_3=tk[3], knn_4=tk[4],
                xyz0=tx[0], xyz1=tx[1], xyz2=tx[2], xyz3=tx[3], xyz4=tx[4],
            )
        want = out[t].numpy()
    finally:
        ref_mod.upsample = orig_upsample

    return {
        "variables": {"params": params, "batch_stats": stats},
        "feats": {str(i): f for i, f in enumerate(feats)},
        "fps": {str(i): f for i, f in enumerate(fps)},
        "knn_idx": {str(i): k for i, k in enumerate(knn_idx)},
        "xyz": {str(i): x for i, x in enumerate(xyz)},
        "want": want,
    }


# --- upsample scatter-mean oracle ------------------------------------------

def upsample_fixture():
    """CPU-adapted oracle of modules/pointnet2_utils.py:13-50 (the
    torch.cuda.FloatTensor is the only CUDA-ism; semantics unchanged)."""
    r = _rng(2)
    B, S, K, C, ratio = 2, 8, 4, 5, 2
    feats = r.normal(size=(B, S, C)).astype(np.float32) + 1.0  # nonzero
    # distinct idx per row, like a real kNN result
    idx = np.stack(
        [
            np.stack([r.permutation(S * ratio)[:K] for _ in range(S)])
            for _ in range(B)
        ]
    ).astype(np.int64)

    tf, ti = torch.from_numpy(feats), torch.from_numpy(idx)
    points1 = tf.unsqueeze(-2).repeat(1, 1, K, 1)
    big = torch.zeros(B, S, S * ratio, C)
    out = big.scatter_(-2, ti.unsqueeze(-1).repeat(1, 1, 1, C), points1)
    total = torch.sum(out, dim=1)
    non_zero = torch.count_nonzero(out[:, :, :, 0], dim=1).unsqueeze(-1).float()
    non_zero = torch.where(non_zero == 0.0, torch.ones_like(non_zero), non_zero)
    want = (total / non_zero).numpy()
    return {"feats": feats, "idx": idx, "n_out": np.int64(S * ratio), "want": want}


# --- PointNetFeaturePropagation --------------------------------------------

def feature_propagation_fixture():
    torch.manual_seed(11)
    # mlp list must be non-empty (the reference reuses its last element as
    # the Linear width); the conv stack itself is never applied in forward.
    ref = REF["pointnet2_utils"].PointNetFeaturePropagation(16, [16], act=False).eval()
    r = _rng(4)
    B, N, S, C = 2, 24, 8, 16
    xyz1 = r.normal(size=(B, N, 3)).astype(np.float32)
    xyz2 = r.normal(size=(B, S, 3)).astype(np.float32)
    p2 = r.normal(size=(B, S, C)).astype(np.float32)
    # transplant FIRST (linear_unit_vars randomizes the BN running stats)
    p, s = H.linear_unit_vars(ref.conv)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(xyz1),
            torch.from_numpy(xyz2),
            None,
            torch.from_numpy(p2),
        ).numpy()
    return {
        "variables": {"params": {"conv": p}, "batch_stats": {"conv": s}},
        "xyz1": xyz1,
        "xyz2": xyz2,
        "p2": p2,
        "want": want,
    }
