"""ShapeNetPart dataset: 16 categories / 50 part labels.

Reference semantics: ``PartNormalDataset`` (dataset/ShapeNetDataLoader.py:27-147)
— category map from synsetoffset2category.txt, split json lists, per-file
np.loadtxt of xyz(+normal)+segidx, pc_normalize, then FPS down to npoints
(which the reference runs on the GPU inside DataLoader workers — here FPS or
padding happens in host preprocessing / on device, never in a worker), and the
``seg_classes`` category->parts table plus ``to_categorical`` one-hot from
tool/train_partseg.py:21-41.

Expected data-root layout (shapenetcore_partanno_segmentation_benchmark_v0_normal):

    {root}/synsetoffset2category.txt                  (16 lines: name \t synset)
    {root}/train_test_split/shuffled_{train,val,test}_file_list.json
    {root}/<synset>/<uuid>.txt                        (rows: x y z nx ny nz seg)

Published split sizes (reference training log,
log/part_seg/res/logs/pointnet2_part_seg_msg.txt): trainval 13998 clouds,
test 2874, 16 categories / 50 global part labels; clouds are ragged
(~500-3000 points) and are resampled to ``npoints`` host-side here (the
reference ran GPU FPS inside DataLoader workers instead). Validate a root
without touching a device:

    python -m mpa_tpu.cli.train --task partseg --dataset shapenetpart \
        --data_root {root} --dry_data_check
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

# Category -> global part labels (tool/train_partseg.py:21-28).
SEG_CLASSES: Dict[str, List[int]] = {
    "Earphone": [16, 17, 18],
    "Motorbike": [30, 31, 32, 33, 34, 35],
    "Rocket": [41, 42, 43],
    "Car": [8, 9, 10, 11],
    "Laptop": [28, 29],
    "Cap": [6, 7],
    "Skateboard": [44, 45, 46],
    "Mug": [36, 37],
    "Guitar": [19, 20, 21],
    "Bag": [4, 5],
    "Lamp": [24, 25, 26, 27],
    "Table": [47, 48, 49],
    "Airplane": [0, 1, 2, 3],
    "Pistol": [38, 39, 40],
    "Chair": [12, 13, 14, 15],
    "Knife": [22, 23],
}

# Stable category order (alphabetical — matches the synset category file order
# used to index one-hot labels).
CATEGORIES: List[str] = sorted(SEG_CLASSES.keys())
SEG_PARTS: List[List[int]] = [SEG_CLASSES[c] for c in CATEGORIES]
NUM_CATEGORIES = len(CATEGORIES)
NUM_PARTS = 50


def to_categorical(labels: np.ndarray, num_classes: int = NUM_CATEGORIES) -> np.ndarray:
    """One-hot encode ``[B]`` -> ``[B, num_classes]`` float32
    (reference to_categorical, tool/train_partseg.py:36-41)."""
    return np.eye(num_classes, dtype=np.float32)[labels]


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Centre + unit max-radius normalization (reference pc_normalize)."""
    pc = pc - pc.mean(axis=0)
    m = np.max(np.sqrt(np.sum(pc**2, axis=1)))
    return pc / max(m, 1e-12)


def _resample_to(points: np.ndarray, seg: np.ndarray, n: int, rng) -> Tuple[np.ndarray, np.ndarray]:
    """Static-size resampling of a ragged cloud: subsample without replacement
    when large enough, else sample with replacement (pad-free, mask-free —
    every output cloud is exactly n points)."""
    if len(points) >= n:
        choice = rng.choice(len(points), n, replace=False)
    else:
        choice = rng.choice(len(points), n, replace=True)
    return points[choice], seg[choice]


class ShapeNetPartDataset:
    """In-RAM ShapeNetPart reader.

    Directory layout (the canonical shapenetcore_partanno_segmentation_benchmark_v0_normal):
      root/synsetoffset2category.txt
      root/train_test_split/shuffled_{split}_file_list.json
      root/<synset>/<uuid>.txt  (x y z nx ny nz seg)
    """

    def __init__(
        self,
        root: str,
        split: str = "trainval",
        npoints: int = 2048,
        use_normals: bool = False,
        seed: int = 0,
    ):
        self.root = root
        self.npoints = npoints
        self.use_normals = use_normals
        self._rng = np.random.default_rng(seed)

        cat_file = os.path.join(root, "synsetoffset2category.txt")
        self.cat2synset: Dict[str, str] = {}
        with open(cat_file) as f:
            for line in f:
                name, synset = line.strip().split()
                self.cat2synset[name] = synset
        synset2cat = {v: k for k, v in self.cat2synset.items()}

        splits = ["train", "val"] if split == "trainval" else [split]
        files: List[str] = []
        for s in splits:
            with open(
                os.path.join(root, "train_test_split", f"shuffled_{s}_file_list.json")
            ) as f:
                files += json.load(f)

        self.items: List[Tuple[str, int]] = []
        for fp in files:
            synset = fp.split("/")[1]
            cat = synset2cat[synset]
            path = os.path.join(root, synset, fp.split("/")[2] + ".txt")
            self.items.append((path, CATEGORIES.index(cat)))
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int, np.ndarray]:
        if i in self._cache:
            data, seg = self._cache[i]
        else:
            from mpa_tpu.data.native_io import loadtxt

            raw = loadtxt(self.items[i][0], 7)  # x y z nx ny nz seg
            data = raw[:, :6] if self.use_normals else raw[:, :3]
            data[:, :3] = pc_normalize(data[:, :3])
            seg = raw[:, -1].astype(np.int64)
            if len(self._cache) < 20000:
                self._cache[i] = (data, seg)
        pts, seg = _resample_to(data, seg, self.npoints, self._rng)
        return pts, self.items[i][1], seg


def load_split(
    root: str,
    split: str,
    npoints: int = 2048,
    use_normals: bool = False,
    limit: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize a whole split as dense arrays (points, categories, segs)."""
    ds = ShapeNetPartDataset(root, split, npoints, use_normals)
    n = len(ds) if limit is None else min(limit, len(ds))
    pts = np.zeros((n, npoints, 6 if use_normals else 3), np.float32)
    cats = np.zeros((n,), np.int64)
    segs = np.zeros((n, npoints), np.int64)
    for i in range(n):
        pts[i], cats[i], segs[i] = ds[i]
    return pts, cats, segs
