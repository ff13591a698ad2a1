"""L1 geometry: spherical/cylindrical coordinates and umbrella surface features.

TPU-native re-design of the reference's geometry layer
(modules/polar_utils.py, modules/recons_utils.py, and the umbrella grouping at
modules/repsurface_utils.py:106-126). NaN repair is masked ``jnp.where`` (no
boolean advanced indexing), randomness is keyed, shapes are static.
"""

from mpa_tpu.geometry.spherical import xyz2sphere, xyz2cylind, convert_polar
from mpa_tpu.geometry.surfaces import (
    cal_normal,
    cal_center,
    cal_const,
    cal_area,
    check_nan,
    check_nan_umbrella,
    knn_surface_features,
    pca,
)
from mpa_tpu.geometry.umbrella import group_by_umbrella

__all__ = [
    "xyz2sphere",
    "xyz2cylind",
    "convert_polar",
    "cal_normal",
    "cal_center",
    "cal_const",
    "cal_area",
    "check_nan",
    "check_nan_umbrella",
    "knn_surface_features",
    "pca",
    "group_by_umbrella",
]
