"""Optional extras: the reference's orphaned experiments (layer X, SURVEY.md
§2.9 — modules never imported by any live path) re-designed in flax so the
framework covers the full component inventory. Not part of any shipped
pipeline; registered as models/blocks for ablation use."""

from mpa_tpu.extras.dgcnn import DGCNN, get_graph_feature
from mpa_tpu.extras.netvlad import NetVLAD, SpatialPyramidNetVLAD, GatingContext
from mpa_tpu.extras.disp3d import Operator3D, OperatorND, NeighborPooling, Disp3DEncoder

__all__ = [
    "DGCNN",
    "get_graph_feature",
    "NetVLAD",
    "SpatialPyramidNetVLAD",
    "GatingContext",
    "Operator3D",
    "OperatorND",
    "NeighborPooling",
    "Disp3DEncoder",
]
