"""L2 neural blocks: the Markov transition operators.

Flax.linen re-designs of the reference's neural layer
(modules/repsurface_utils.py:206-639, modules/pointnet2_utils.py:333-912):
channel-last, static-shape, jit-first. The reference's inverted ``bn`` flag
(bn=False selects BatchNorm, modules/repsurface_utils.py:380-404) is mapped to
an explicit ``norm='batch'|'layer'|None`` config without changing the math.
"""

from mpa_tpu.nn.linear import LinearUnit
from mpa_tpu.nn.local_trans import LocalTrans
from mpa_tpu.nn.local_merge import LocalMerge
from mpa_tpu.nn.umbrella_constructor import UmbrellaSurfaceConstructor
from mpa_tpu.nn.surface_abstraction import (
    sample_and_group,
    sample_and_group_all,
    SurfaceAbstraction,
    SurfaceAbstractionCD,
)
from mpa_tpu.nn.keephigh import KeepHighResolutionEncoder
from mpa_tpu.nn.fuse import Fuse, compose_fps_chain
from mpa_tpu.nn.feature_propagation import PointNetFeaturePropagation
from mpa_tpu.nn.keephigh_partseg import KeepHighResolutionPartSeg

__all__ = [
    "LinearUnit",
    "LocalTrans",
    "LocalMerge",
    "UmbrellaSurfaceConstructor",
    "sample_and_group",
    "sample_and_group_all",
    "SurfaceAbstraction",
    "SurfaceAbstractionCD",
    "KeepHighResolutionEncoder",
    "Fuse",
    "compose_fps_chain",
    "PointNetFeaturePropagation",
    "KeepHighResolutionPartSeg",
]
