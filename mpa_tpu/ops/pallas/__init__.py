"""Pallas TPU kernels for the hot point-set primitives.

Each kernel has an XLA fallback (the reference implementation in mpa_tpu.ops);
``*_pallas`` variants are used automatically on TPU where profitable.
"""

from mpa_tpu.ops.pallas.fps_pallas import farthest_point_sample_pallas
from mpa_tpu.ops.pallas.knn_pallas import knn_pallas, knn_indices_pallas

__all__ = ["farthest_point_sample_pallas", "knn_pallas", "knn_indices_pallas"]
