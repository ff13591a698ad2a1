"""L0 point-set primitive ops: static-shape, jit/vmap-friendly, MXU-backed.

TPU-native equivalents of the reference's primitive layer
(reference: modules/pointnet2_utils.py, modules/repsurface_utils.py) and of the
CUDA op package the reference links against but does not ship
(farthest_point_sample/query_knn_point/query_ball_point/index_points/sample/upsample,
see SURVEY.md §2.2).

Layout convention: points/features are channel-LAST `[B, N, C]` (the reference is
channel-first `[B, C, N]` for torch convs; channel-last is the XLA/TPU-friendly
layout and is used consistently across this framework).
"""

from mpa_tpu.ops.pairwise import inner_correlation, square_distance
from mpa_tpu.ops.gather import index_points, resort_points, mod_index
from mpa_tpu.ops.knn import knn, knn_self, knn_point2
from mpa_tpu.ops.fps import (
    banded_farthest_point_sample,
    farthest_point_sample,
    pick_fps_bands,
)
from mpa_tpu.ops.ball_query import ball_query
from mpa_tpu.ops.scatter import scatter_mean_upsample
from mpa_tpu.ops.interp import three_nn_interpolate
from mpa_tpu.ops.sampling import subsample_points, random_sample

__all__ = [
    "square_distance",
    "inner_correlation",
    "index_points",
    "resort_points",
    "knn",
    "knn_self",
    "knn_point2",
    "mod_index",
    "farthest_point_sample",
    "ball_query",
    "scatter_mean_upsample",
    "three_nn_interpolate",
    "subsample_points",
    "random_sample",
]
