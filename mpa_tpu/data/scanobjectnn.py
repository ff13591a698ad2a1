"""ScanObjectNN (15 classes) h5 reader.

Reference semantics: ``ScanObjectNNDataLoader`` (dataset/ScanObjectNNDataLoader.py:8-31):
loads ``{root}/main_split[_nobg]/{split}_objectdataset_augmentedrot_scale75.h5``
with datasets ``data`` float32 ``[M, 2048, 3]`` and ``label`` int. Channel-last
output here (the reference transposes to [3, 2048] for torch convs).

Expected data-root layout (PB_T50_RS, the published benchmark variant):

    {root}/main_split/training_objectdataset_augmentedrot_scale75.h5
    {root}/main_split/test_objectdataset_augmentedrot_scale75.h5
    {root}/main_split_nobg/...                        (background=False)

Published split sizes (reference training log,
log/ScanObjectNN/res/logs/repsurf.repsurf_ssg_umb.txt): training 11416
clouds, test 2882 clouds, 15 classes, every cloud exactly 2048 points.
Validate a root without touching a device:

    python -m mpa_tpu.cli.train --task cls --dataset scanobjectnn \
        --data_root {root} --dry_data_check
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

NUM_CLASSES = 15


def load_scanobjectnn(
    root: str, split: str = "training", background: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (points ``[M, 2048, 3]`` float32, labels ``[M]`` int64).
    split: 'training' | 'test'."""
    import h5py

    subdir = "main_split" if background else "main_split_nobg"
    path = os.path.join(
        root, subdir, f"{split}_objectdataset_augmentedrot_scale75.h5"
    )
    with h5py.File(path, "r") as f:
        points = f["data"][:].astype(np.float32)
        labels = f["label"][:].astype(np.int64)
    return points, labels
