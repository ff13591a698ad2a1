"""Torch-side fixture builder for the L1 geometry golden-parity oracles
(modules/polar_utils.py, modules/recons_utils.py, modules/pointnet2_utils.py
group_by_umbrella). One small fixture covers all cases."""

import numpy as np
import torch

from torch_side.helpers import load_reference

REF = load_reference()


def geometry_fixture():
    r = {s: np.random.default_rng(s) for s in range(11)}
    out = {}

    x = r[0].normal(size=(2, 32, 3)).astype(np.float32)
    out["sphere/x"] = x
    out["sphere/want"] = REF["polar_utils"].xyz2sphere(torch.from_numpy(x)).numpy()

    x = r[1].normal(size=(2, 16, 3)).astype(np.float32)
    out["cylind/x"] = x
    out["cylind/want"] = REF["polar_utils"].xyz2cylind(torch.from_numpy(x)).numpy()

    tri = r[2].normal(size=(2, 8, 4, 3, 3)).astype(np.float32)
    out["normal_group/tri"] = tri
    out["normal_group/want"] = (
        REF["recons_utils"]
        .cal_normal(torch.from_numpy(tri), random_inv=False, is_group=True)
        .numpy()
    )

    tri = r[3].normal(size=(2, 8, 3, 3)).astype(np.float32)
    out["normal_nongroup/tri"] = tri
    out["normal_nongroup/want"] = (
        REF["recons_utils"]
        .cal_normal(torch.from_numpy(tri), random_inv=False, is_group=False)
        .numpy()
    )

    tri = r[6].normal(size=(2, 8, 4, 3, 3)).astype(np.float32)
    out["center/tri"] = tri
    out["center/want"] = REF["recons_utils"].cal_center(torch.from_numpy(tri)).numpy()

    n = r[7].normal(size=(2, 8, 3)).astype(np.float32)
    c = r[7].normal(size=(2, 8, 3)).astype(np.float32)
    out["const/n"], out["const/c"] = n, c
    out["const/want"] = (
        REF["recons_utils"].cal_const(torch.from_numpy(n), torch.from_numpy(c)).numpy()
    )

    tri = r[8].normal(size=(2, 6, 3, 3)).astype(np.float32)
    out["area/tri"] = tri
    out["area/want"] = REF["recons_utils"].cal_area(torch.from_numpy(tri)).numpy()

    B, N, G = 2, 6, 4
    normal = r[9].normal(size=(B, N, G, 3)).astype(np.float32)
    center = r[9].normal(size=(B, N, G, 3)).astype(np.float32)
    pos = r[9].normal(size=(B, N, G, 1)).astype(np.float32)
    normal[0, 2, 0] = np.nan
    normal[1, 4, 2] = np.nan
    normal[1, 4, 3] = np.nan
    wn, wc, wp = REF["recons_utils"].check_nan_umb(
        torch.from_numpy(normal.copy()),
        torch.from_numpy(center.copy()),
        torch.from_numpy(pos.copy()),
    )
    out["nan_umb/normal"], out["nan_umb/center"], out["nan_umb/pos"] = normal, center, pos
    out["nan_umb/want_normal"] = wn.numpy()
    out["nan_umb/want_center"] = wc.numpy()
    out["nan_umb/want_pos"] = wp.numpy()

    x = r[10].normal(size=(2, 24, 3)).astype(np.float32)
    out["umbrella/x"] = x
    out["umbrella/want"] = (
        REF["pointnet2_utils"]
        .group_by_umbrella(torch.from_numpy(x), torch.from_numpy(x), k=7)
        .numpy()
    )
    return out
