"""Utilities: config, logging, seeding, initialization, profiling."""

from mpa_tpu.utils.config import TrainConfig
from mpa_tpu.utils.logging import make_logger
from mpa_tpu.utils.init import set_seed, zero_init_dense
from mpa_tpu.utils.profiling import profile_trace, count_params, estimate_flops

__all__ = [
    "TrainConfig",
    "make_logger",
    "set_seed",
    "zero_init_dense",
    "profile_trace",
    "count_params",
    "estimate_flops",
]
