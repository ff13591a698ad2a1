"""Data layer: dataset readers, jit-able augmentations, synthetic generators.

Loaders return numpy arrays (host) in channel-last ``[N, C]`` per cloud;
batching/sharding happens in the pipeline. Augmentations are pure jnp
functions usable inside jit (the reference's numpy ``tool/provider.py`` and
torch ``modules/ptaug_utils.py`` both map here).
"""

from mpa_tpu.data.augment import (
    normalize_point_cloud,
    random_scale,
    random_shift,
    random_jitter,
    random_rotate_z,
    random_rotate_y,
    random_rotate_perturb,
    random_rotate_y_with_normal,
    random_rotate_perturb_with_normal,
    rotate_by_angle,
    random_point_dropout,
    shuffle_points,
    transform_point_cloud,
    get_aug_args,
)
from mpa_tpu.data.synthetic import (
    realistic_clouds,
    realistic_partseg,
    synthetic_clouds,
    synthetic_partseg,
)

__all__ = [
    "normalize_point_cloud",
    "random_scale",
    "random_shift",
    "random_jitter",
    "random_rotate_z",
    "random_rotate_y",
    "random_rotate_perturb",
    "random_rotate_y_with_normal",
    "random_rotate_perturb_with_normal",
    "rotate_by_angle",
    "random_point_dropout",
    "shuffle_points",
    "transform_point_cloud",
    "get_aug_args",
    "realistic_clouds",
    "realistic_partseg",
    "synthetic_clouds",
    "synthetic_partseg",
]
