"""Load the reference PyTorch modules as golden-parity oracles.

The reference dump has broken imports (SURVEY.md §0.1): it links against an
absent CUDA op package (`query_knn_point`, `farthest_point_sample(cuda=)`, ...)
and uses renamed paths (`models.polar_utils` vs the on-disk `modules/`).
This shim repairs the import graph *in sys.modules only* — nothing under
/root/reference is written — by pre-seeding a `modules.pointnet2_utils` module
with pure-torch equivalents of the missing CUDA ops, then exec-ing the real
reference sources into it.

The oracle functions defined here are NOT part of the framework — they exist
solely so tests can diff mpa_tpu outputs against the original torch behaviour.
"""

from __future__ import annotations

import sys
import types

import torch

REF_ROOT = "/root/reference/Markov_Process_Analysis_on_Point_Cloud"

_loaded: dict = {}


# --- pure-torch equivalents of the reference's missing CUDA ops -------------
def _square_distance(src, dst):
    return torch.cdist(src, dst) ** 2


def _query_knn_point(k, xyz, new_xyz, cuda=False):
    dist = _square_distance(new_xyz, xyz)
    return dist.topk(k, dim=-1, largest=False, sorted=True)[1]


def _index_points(points, idx, cuda=False, is_group=False):
    B = points.shape[0]
    view_shape = [B] + [1] * (idx.dim() - 1)
    repeat_shape = [1] + list(idx.shape[1:])
    batch_indices = (
        torch.arange(B, dtype=torch.long).view(view_shape).repeat(repeat_shape)
    )
    return points[batch_indices, idx, :]


def _farthest_point_sample(xyz, npoint, cuda=False, start_idx=0):
    B, N, _ = xyz.shape
    out = torch.zeros(B, npoint, dtype=torch.long)
    dist = torch.full((B, N), float("inf"))
    farthest = torch.full((B,), start_idx, dtype=torch.long)
    batch = torch.arange(B)
    for i in range(npoint):
        out[:, i] = farthest
        centroid = xyz[batch, farthest, :].view(B, 1, 3)
        d = torch.sum((xyz - centroid) ** 2, -1)
        dist = torch.minimum(dist, d)
        farthest = torch.max(dist, -1)[1]
    return out


def _query_ball_point(radius, nsample, xyz, new_xyz, cuda=False):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = _square_distance(new_xyz, xyz)
    group_idx = torch.arange(N, dtype=torch.long).view(1, 1, N).repeat(B, S, 1)
    group_idx[sqrdists > radius**2] = N
    group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
    group_first = group_idx[:, :, 0:1].repeat(1, 1, nsample)
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    return group_idx


def _sample(num_point, points, cuda=False):
    # Deterministic variant of upstream RepSurf batch-ingest subsampling.
    return points[:, :, :num_point]


def load_reference():
    """Import-repair the reference and return a namespace of its modules."""
    if _loaded:
        return _loaded
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # 1) Seed a stub modules.pointnet2_utils with the missing CUDA-op names so
    #    modules.recons_utils can import (it only needs these two).
    import modules  # the reference's package __init__ (empty)

    stub = types.ModuleType("modules.pointnet2_utils")
    stub.query_knn_point = _query_knn_point
    stub.index_points = _index_points
    sys.modules["modules.pointnet2_utils"] = stub
    modules.pointnet2_utils = stub

    import modules.polar_utils as polar_utils
    import modules.recons_utils as recons_utils

    # 2) Alias the renamed `models.*` paths used by modules/pointnet2_utils.py.
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = []
    sys.modules.setdefault("models", models_pkg)
    sys.modules["models.polar_utils"] = polar_utils
    sys.modules["models.recons_utils"] = recons_utils

    # 3) Exec the real pointnet2_utils source into the stub (its own imports
    #    now resolve), then re-attach the missing CUDA-op names.
    src = open(f"{REF_ROOT}/modules/pointnet2_utils.py").read()
    exec(compile(src, f"{REF_ROOT}/modules/pointnet2_utils.py", "exec"), stub.__dict__)
    stub.query_knn_point = _query_knn_point
    stub.index_points = _index_points
    stub.farthest_point_sample_cuda = _farthest_point_sample
    stub.sample = _sample

    # 4) Now the top-level neural-block module imports cleanly.
    import modules.repsurface_utils as repsurface_utils

    _loaded.update(
        polar_utils=polar_utils,
        recons_utils=recons_utils,
        pointnet2_utils=stub,
        repsurface_utils=repsurface_utils,
    )
    return _loaded
